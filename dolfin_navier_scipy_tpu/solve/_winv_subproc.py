"""Throwaway-process runner for the banded truncated-inverse build.

The localized W build (:func:`.sadpnt._build_winv_banded`) aborts the
tunneled TPU client at lvl3 shapes (bs=896, ww~6144) when it runs in a
process whose device context already holds the X/S factor-build
programs — while the IDENTICAL shapes succeed in 8 s in a clean
process, even under multi-GB HBM ballast (docs/PERF_NOTES.md section
18.2: the trigger is process context, not the program).  This module
is the clean process: the caller ships the banded F blocks through an
npz file, this process builds W with its own fresh TPU client and
writes the blocks back; concurrent clients through the tunnel are
supported (verified 2026-08-21: a subprocess ran device matmuls while
the parent held live buffers, both stayed healthy).

Usage (see :func:`.sadpnt._build_winv_banded_subproc`):

    python -m dolfin_navier_scipy_tpu.solve._winv_subproc in.npz out.npy
"""

import sys

import numpy as np


def main(inpath, outpath):
    d = np.load(inpath)
    import jax.numpy as jnp

    from .sadpnt import _build_winv_banded

    W = _build_winv_banded(
        jnp.asarray(d["Bblk"]),
        np.asarray(d["dinv_perm"], np.float32),
        int(d["bs"]), int(d["nblk"]), int(d["nin"]),
        tuple(int(b) for b in d["wbases"]), int(d["ww"]),
        int(d["niter"]))
    np.save(outpath, np.asarray(W))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
