"""Scale-out: sharded operators and ensemble (batched) simulation.

The reference is strictly serial (SURVEY.md section 2.10); these are the
TPU-native equivalents: dof-sharded SpMV over an ICI mesh and vmap/pjit
ensembles over parameter sweeps.
"""
