"""Element-axis domain decomposition of the FEM operators.

The reference is strictly serial (SURVEY.md section 2.10).  The natural
spatial parallelism of the TPU build shards the ELEMENT axis of the
affine/convection kernels across an ICI mesh axis:

* element tables (geometry factors, dof maps) are partitioned — the
  dominant memory, divided by the device count,
* the state vector is replicated — it is O(n) floats (KB..MB for FEM
  problems) against O(n k^2) element data, so replication is the right
  trade on ICI-connected chips,
* each device gathers from its replicated state copy, contracts its
  own elements (pure local MXU/VPU work), scatter-adds into a local
  output and ``psum``s — ONE reduction collective per operator
  application, no per-matvec all-gather (the round-1 dof-sharded SpMV
  all-gathered the full vector every application).

Everything is a registered pytree: the sharded operators travel through
``jax.jit`` as arguments, never as baked-in HLO constants.
"""

import numpy as np

import jax
import jax.numpy as jnp
try:                                   # jax >= 0.8 top-level API
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs,
                  check_rep=True):
        # the top-level API renamed check_rep -> check_vma
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs,
                          check_vma=check_rep)
except ImportError:                    # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.affine import AffineVectorOps, OpView
from ..ops.convection import ConvectionKernel

# element-axis leaves of each kernel (the rest are constant reference-
# element weight tables, replicated)
_AFF_SHARDED = {"JinvT", "wdet", "vdofs", "pdofs", "detJ",
                "fac_elem", "fac_vdofs"}
_CONV_NAMES = ("W1blk", "W2blk", "W2Tblk", "W3blk", "Nq", "dNq",
               "JinvT", "wdet", "nodes", "vd", "vdofs_flat")
_CONV_AUX = ("nv_full", "Q", "nvpc", "blk", "nc", "nc_real", "dim")
_CONV_SHARDED = {"JinvT", "wdet", "nodes", "vd", "vdofs_flat"}


def _pad_axis0(arr, n_to, fill):
    arr = np.asarray(arr)
    pad = n_to - arr.shape[0]
    if pad == 0:
        return arr
    block = np.full((pad,) + tuple(arr.shape[1:]), fill, dtype=arr.dtype)
    return np.concatenate([arr, block], axis=0)


def _place(name, leaf, sharded, mesh, axis, n_to, fills):
    """(placed leaf, in_spec) — element leaves row-sharded, rest repl."""
    if leaf is None:
        return None, None
    if name in sharded:
        arr = _pad_axis0(leaf, n_to, fills.get(name, 0))
        spec = P(*([axis] + [None] * (arr.ndim - 1)))
        return jax.device_put(jnp.asarray(arr),
                              NamedSharding(mesh, spec)), spec
    return jax.device_put(jnp.asarray(leaf),
                          NamedSharding(mesh, P())), P()


@jax.tree_util.register_pytree_node_class
class ShardedAffineOps:
    """Element-sharded :class:`AffineVectorOps`: same matvec surface,
    each application = local element contraction + one ``psum``."""

    def __init__(self, aff=None, mesh=None, axis="elem",
                 _leaves=None, _aux=None):
        if _leaves is not None:
            self.leaves = _leaves
            (self.mesh, self.axis, self.in_specs, self.aux_local,
             self.nin, self.npc) = _aux
            return
        self.mesh = mesh
        self.axis = axis
        ndev = mesh.shape[axis]
        leaves, aux = aff.tree_flatten()
        names = AffineVectorOps._leaf_names
        auxd = dict(zip(AffineVectorOps._aux_names, aux))
        blk = auxd["blk"]
        nc_pad = ((auxd["nc"] + ndev * blk - 1)
                  // (ndev * blk)) * (ndev * blk)
        nfac = leaves[names.index("fac_elem")].shape[0]
        nfac_pad = ((nfac + ndev - 1) // ndev) * ndev
        fills = {"vdofs": auxd["nin"], "pdofs": auxd["npc"],
                 "fac_vdofs": auxd["nin"]}
        placed, specs = [], []
        for n, leaf in zip(names, leaves):
            n_to = nfac_pad if n.startswith("fac_") else nc_pad
            p, s = _place(n, leaf, _AFF_SHARDED, mesh, axis, n_to, fills)
            placed.append(p)
            specs.append(s)
        self.leaves = tuple(placed)
        self.in_specs = tuple(specs)
        auxd["nc"] = nc_pad // ndev
        self.aux_local = tuple(auxd[k] for k in AffineVectorOps._aux_names)
        self.nin = auxd["nin"]
        self.npc = auxd["npc"]

    def tree_flatten(self):
        return (self.leaves, (self.mesh, self.axis, self.in_specs,
                              self.aux_local, self.nin, self.npc))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(_leaves=tuple(children), _aux=aux)

    def _apply(self, kind, cm, ca, x):
        aux_local, axis = self.aux_local, self.axis

        def local(*args):
            lv, xs = args[:-1], args[-1]
            la = AffineVectorOps.tree_unflatten(aux_local, lv)
            if kind == "m":
                y = la.m_matvec(xs)
            elif kind == "ma":
                y = la.ma_matvec(xs, cm, ca)
            elif kind == "j":
                y = la.j_matvec(xs)
            else:  # jt
                y = la.jt_matvec(xs)
            return jax.lax.psum(y, axis)

        return shard_map(
            local, mesh=self.mesh,
            in_specs=tuple(self.in_specs) + (P(),),
            out_specs=P(),
        )(*self.leaves, x)

    # AffineVectorOps-compatible surface ------------------------------------
    def m_matvec(self, x):
        return self._apply("m", 1.0, 0.0, x)

    def a_matvec(self, x):
        return self._apply("ma", 0.0, 1.0, x)

    def ma_matvec(self, x, cm, ca):
        return self._apply("ma", cm, ca, x)

    def j_matvec(self, x):
        return self._apply("j", 0.0, 0.0, x)

    def jt_matvec(self, q):
        return self._apply("jt", 0.0, 0.0, q)

    def view(self, kind, cm=1.0, ca=0.0):
        return OpView(self, kind, cm, ca)


@jax.tree_util.register_pytree_node_class
class ShardedConvKernel:
    """Element-sharded :class:`ConvectionKernel` (the per-step
    state-dependent assembly): local quadrature + one ``psum``."""

    def __init__(self, kern=None, mesh=None, axis="elem",
                 _leaves=None, _aux=None):
        if _leaves is not None:
            self.leaves = _leaves
            (self.mesh, self.axis, self.in_specs, self.aux_local) = _aux
            return
        self.mesh = mesh
        self.axis = axis
        ndev = mesh.shape[axis]
        leaves, aux = kern.tree_flatten()
        auxd = dict(zip(_CONV_AUX, aux))
        blk = auxd["blk"]
        nc_pad = ((auxd["nc"] + ndev * blk - 1)
                  // (ndev * blk)) * (ndev * blk)
        lv = dict(zip(_CONV_NAMES, leaves))
        # rebuild the flat dof list from the padded vd so it shards
        # consistently with the element axis
        vd_pad = _pad_axis0(lv["vd"], nc_pad, auxd["nv_full"])
        lv["vd"] = vd_pad
        lv["vdofs_flat"] = vd_pad          # re-flattened locally
        fills = {"vd": auxd["nv_full"], "nodes": 0}
        placed, specs = [], []
        for n in _CONV_NAMES:
            p, s = _place(n, lv[n], _CONV_SHARDED, mesh, axis,
                          nc_pad, fills)
            placed.append(p)
            specs.append(s)
        self.leaves = tuple(placed)
        self.in_specs = tuple(specs)
        auxd["nc"] = nc_pad // ndev
        auxd["nc_real"] = nc_pad // ndev
        self.aux_local = tuple(auxd[k] for k in _CONV_AUX)

    def tree_flatten(self):
        return (self.leaves, (self.mesh, self.axis, self.in_specs,
                              self.aux_local))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(_leaves=tuple(children), _aux=aux)

    def vector(self, u1_full, u2_full=None):
        aux_local, axis = self.aux_local, self.axis
        u2 = u1_full if u2_full is None else u2_full

        def local(*args):
            lv, u1s, u2s = args[:-2], args[-2], args[-1]
            lv = list(lv)
            # vdofs_flat travels in its (nc, nd) layout; flatten locally
            lv[-1] = lv[-1].reshape(-1)
            lk = ConvectionKernel.tree_unflatten(aux_local, tuple(lv))
            return jax.lax.psum(lk.vector(u1s, u2s), axis)

        return shard_map(
            local, mesh=self.mesh,
            in_specs=tuple(self.in_specs) + (P(), P()),
            out_specs=P(),
        )(*self.leaves, u1_full, u2)


@jax.tree_util.register_pytree_node_class
class ShardedSchurSolver:
    """Block-Schur solver with the dense factors ROW-SHARDED over the
    ICI mesh axis — multi-chip buys *capacity*, not just throughput.

    ``X (nv, np)`` is the memory that exhausts one chip first (9.3 GB at
    the reference's karman lvl4 mesh, docs/ROADMAP.md): its rows (and the
    stacked hi/lo ``S^{-1}`` rows) are partitioned across the devices;
    the PCG F-solve rides the already element-sharded operators (one
    ``psum`` per application), and each dense factor application is one
    local MXU matmul + one tiled ``all_gather`` of the row blocks.

    Replicated pieces: ``dinv`` (an O(nv) vector) and the rhs/state.
    """

    _leaf_names = ("XT_sh", "Sinv_sh", "dinv", "Kop", "Jop")
    _aux_names = ("mesh", "axis", "nv", "np", "ns", "ncg", "dtype")

    def __init__(self, base=None, mesh=None, axis="elem",
                 factors=None, _leaves=None, _aux=None):
        """Wrap a built :class:`~..solve.sadpnt.SchurSaddleSolver`
        (``base``; its ``res_ops`` must already be sharded views), or
        pass ``factors=(XT, Sinv, dinv, ncg, Kop, Jop)`` directly —
        ``XT (np_pad, nv)`` is the solver's transposed factor layout —
        (used by the capacity dryrun, where seeding exact factors on a
        single host core would take an hour)."""
        if _leaves is not None:
            for n, v in zip(self._leaf_names, _leaves):
                setattr(self, n, v)
            for n, v in zip(self._aux_names, _aux):
                setattr(self, n, v)
            return
        if factors is not None:
            XT, Sinv, dinv, ncg, Kop, Jop = factors
        else:
            XT, Sinv, dinv, ncg = (base.XT, base.Sinv, base.dinv,
                                   base.ncg)
            if isinstance(XT, tuple):      # row-parts (large builds)
                XT = jnp.concatenate(list(XT), axis=0)
            Kop, Jop = base.Kop, base.Jop
        self.mesh = mesh
        self.axis = axis
        self.nv = XT.shape[1]
        self.np = Sinv.shape[1]
        self.ns = Sinv.shape[0]
        self.ncg = int(ncg)
        self.dtype = XT.dtype
        self.dinv = jax.device_put(jnp.asarray(dinv),
                                   NamedSharding(mesh, P()))
        self.Kop, self.Jop = Kop, Jop
        ndev = mesh.shape[axis]

        def _shard(A, ax):
            # host arrays are padded in numpy and device_put SHARDED —
            # each device receives only its block, so a factor larger
            # than one chip's HBM never stages on a single device
            n = A.shape[ax]
            n_pad = ((n + ndev - 1) // ndev) * ndev
            if n_pad != n:
                pshape = list(A.shape)
                pshape[ax] = n_pad - n
                xp = np if isinstance(A, np.ndarray) else jnp
                A = xp.concatenate(
                    [A, xp.zeros(tuple(pshape), A.dtype)], axis=ax)
            spec = P(axis, None) if ax == 0 else P(None, axis)
            return jax.device_put(A, NamedSharding(mesh, spec))

        # X^T: the big (velocity) axis is axis 1 -> COLUMN-shard;
        # S^{-1}: row-shard the stacked hi/lo rows
        self.XT_sh = _shard(XT, 1)
        self.Sinv_sh = _shard(Sinv, 0)

    def tree_flatten(self):
        return (tuple(getattr(self, n) for n in self._leaf_names),
                tuple(getattr(self, n) for n in self._aux_names))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(_leaves=children, _aux=aux)

    def _rows_apply(self, A_sh, g, nrows):
        """Row-sharded dense matvec: one local MXU matmul per device;
        the output stays row-sharded (``P(axis)``) and XLA inserts the
        gather where the consumer needs the replicated value."""
        axis = self.axis

        def local(Al, gs):
            return Al @ gs

        out = shard_map(local, mesh=self.mesh,
                        in_specs=(P(axis, None), P()),
                        out_specs=P(axis))(A_sh, g)
        return out[:nrows]

    def _fmv(self, x):
        return self.Kop.matvec(x)

    def _fsolve(self, b, x0=None, niter=None):
        from ..solve.sadpnt import jacobi_pcg

        return jacobi_pcg(self._fmv, self.dinv, b, niter or self.ncg,
                          x0=x0)

    def _sapply(self, g):
        q2 = self._rows_apply(self.Sinv_sh, g, self.ns)
        if self.ns == 2 * self.np:
            return q2[: self.np] + q2[self.np:]
        return q2

    def _xapply(self, q):
        """Column-sharded ``X q = q @ X^T``: one local vecmat per
        device, output left sharded along the velocity axis."""
        axis = self.axis
        npad = self.XT_sh.shape[0]
        if npad != self.np:
            q = jnp.zeros((npad,), q.dtype).at[: self.np].set(q)

        def local(XTl, qs):
            return qs @ XTl

        out = shard_map(local, mesh=self.mesh,
                        in_specs=(P(None, axis), P()),
                        out_specs=P(axis))(self.XT_sh, q)
        return out[: self.nv]

    def solve(self, rhsv, rhsp):
        bv = rhsv.reshape(-1).astype(self.dtype)
        bp = rhsp.reshape(-1).astype(self.dtype)
        y = self._fsolve(bv)
        q = self._sapply(self.Jop.matvec(y) - bp)
        v = y - self._xapply(q)
        return jnp.concatenate([v, q])

    @property
    def ncg_warm(self):
        return max(6, (2 * self.ncg) // 3)

    def solve_warm(self, rhsv, rhsp, y0, niter=None):
        bv = rhsv.reshape(-1).astype(self.dtype)
        bp = rhsp.reshape(-1).astype(self.dtype)
        y = self._fsolve(bv, x0=y0, niter=niter or self.ncg_warm)
        q = self._sapply(self.Jop.matvec(y) - bp)
        v = y - self._xapply(q)
        return jnp.concatenate([v, q]), y


def make_sharded_cnab_step(prob, dt, mesh: Mesh, axis: str = "elem",
                           theta=0.5, work_dtype=None,
                           shard_factors=False, setup="auto",
                           factors=None):
    """Increment-form CNAB step with ALL per-step operator work sharded
    over the element axis (convection assembly, A-matvec, the PCG
    F-solves of the block-Schur solver).

    ``shard_factors=True`` additionally ROW-SHARDS the dense Schur
    factors (X, stacked S^{-1}) over the same axis
    (:class:`ShardedSchurSolver`) — this is what extends *capacity* past
    the single-chip HBM ceiling (lvl4/150k dofs, docs/ROADMAP.md); with
    ``False`` they stay replicated (pure-throughput mode).

    Returns ``(step, bundle)`` with
    ``step(bundle, (v, nfc_o)) -> (v_n, nfc_c)``; jit/scan-safe — pass
    ``bundle`` as a pytree argument.
    """
    import scipy.sparse as sps

    from ..solve.sadpnt import SchurSaddleSolver

    if work_dtype is None:
        work_dtype = (jnp.float64 if jax.default_backend() == "cpu"
                      else jnp.float32)
    aff = prob.affine_ops(work_dtype)
    saff = ShardedAffineOps(aff, mesh, axis)
    kern = ConvectionKernel(prob.ctx, dtype=work_dtype)
    skern = ShardedConvKernel(kern, mesh, axis)
    res_ops = (saff.view("ma", cm=1.0, ca=theta * dt), saff.view("j"))
    if factors is not None:
        # pre-seeded (XT, Sinv, dinv, ncg) in the solver's transposed-X
        # layout: skip the full solver build — the lvl4 capacity path,
        # where exact factor seeding costs ~25 min on this single-core
        # host (tests/test_capacity_lvl4.py)
        XT, Sinv, dinv, ncg = factors
        solver = ShardedSchurSolver(
            mesh=mesh, axis=axis,
            factors=(XT, Sinv, dinv, ncg, res_ops[0], res_ops[1]))
    else:
        coeff = sps.csr_matrix(prob.Mc + theta * dt * prob.Ac)
        # banded=False: the sharded machinery shards the ELEMENT matvec,
        # so its replicated twin must use the identical element pipeline
        # (tests assert sharded == replicated to 1e-12); the RCM-banded
        # fast path is a single-chip layout.
        solver = SchurSaddleSolver(
            coeff, prob.Jc, prob.JTc, res_ops=res_ops,
            dtype=work_dtype, setup=setup, banded=False)
        if shard_factors:
            solver = ShardedSchurSolver(base=solver, mesh=mesh, axis=axis)
    bundle = dict(
        solver=solver,
        kern=skern,
        aff=saff,
        invinds=jnp.asarray(prob.invinds),
        v_bc=jnp.asarray(prob.bc_full_vec()),
        fv=jnp.asarray(np.asarray(prob.fv).ravel()),
        zp=jnp.zeros((prob.np_cond,)),
    )
    nin = len(prob.invinds)

    def step(b, carry):
        v, nfc_o = carry
        v_full = b["v_bc"].at[b["invinds"]].set(v)
        nfc_c = -b["kern"].vector(v_full)[b["invinds"]]
        # AB2 extrapolation weight is dt/2 regardless of the implicit
        # theta (time_int_utils.py:127 uses 0.5*dt with theta fixed 0.5).
        rhs_d = (-dt * b["aff"].a_matvec(v)
                 + 0.5 * dt * (3 * nfc_c - nfc_o) + dt * b["fv"])
        sol = b["solver"].solve(rhs_d, b["zp"])
        return (v + sol[:nin].astype(v.dtype), nfc_c.astype(nfc_o.dtype))

    return step, bundle
