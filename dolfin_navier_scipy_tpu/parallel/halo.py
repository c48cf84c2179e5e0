"""Halo-exchange domain decomposition: O(interface) collectives.

The element-sharded operators in :mod:`.spatial` replicate the state and
``psum`` the output — one O(n) collective per application.  That is the
right trade at FEM sizes (KBs of state), but for very large meshes the
collective should move only the *interface* values.  This module
implements that variant:

* velocity dofs are **band-reordered** (reverse Cuthill-McKee on the
  element incidence graph) and partitioned into ``ndev`` contiguous
  blocks; elements go to the device owning their smallest dof,
* each device keeps only its dof block; one application exchanges a
  **halo** of ``h`` values with its grid neighbours (``h`` = the RCM
  bandwidth, measured from the actual element tables at build time and
  asserted to fit a single-hop exchange), computes its elements locally
  (the same affine-factorized pipeline as single-chip — the local block
  is an :class:`~..ops.affine.AffineVectorOps` over window-local
  indices), and returns halo contributions to the neighbours,
* per application: 2x ``ppermute`` of ``h`` values in, 2x ``ppermute``
  of ``h`` values out — O(bandwidth), not O(n); dot products in the
  PCG reduce scalars.

Pressure dofs get the same treatment with ownership by the smallest
owner of any incident element (per-device padded blocks, so shard sizes
stay equal without renumbering drift).

The reference is strictly serial (SURVEY.md section 2.10); no
counterpart exists there.  Layout helpers: vectors live in the PERMUTED
device-sharded layout inside solver loops (``to_perm``/``from_perm``
translate at the boundaries — O(n) local gathers, no collectives).
"""

import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
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

from ..ops.affine import AffineVectorOps


def _rcm_perm(vdofs, nin):
    """new[old] index map from RCM over the element incidence graph."""
    import scipy.sparse as sps
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    vd = np.asarray(vdofs)
    real = vd < nin
    # adjacency: ALL dof pairs sharing an element — nc*nd^2 entries
    # (8.6M at the 61k-dof lvl3 mesh: fine on host, and the element
    # spread we must bound IS the pairwise bandwidth, so a sparser
    # surrogate graph gives RCM the wrong objective)
    nd = vd.shape[1]
    a = np.repeat(vd[:, :, None], nd, axis=2)
    m = real[:, :, None] & real[:, None, :]
    rows = a[m]
    cols = np.swapaxes(a, 1, 2)[m]
    A = sps.coo_matrix(
        (np.ones(2 * len(rows)),
         (np.concatenate([rows, cols]), np.concatenate([cols, rows]))),
        shape=(nin, nin)).tocsr()
    order = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))
    new = np.empty(nin, dtype=np.int64)
    new[order] = np.arange(nin, dtype=np.int64)
    return new


def _halo_of(masked_idx, nb):
    """Required single-sided halo width for block-local index tables
    (``masked_idx`` has trash entries already zeroed)."""
    if masked_idx.size == 0:
        return 0
    return int(max(0, -masked_idx.min(), masked_idx.max() - nb + 1))


@jax.tree_util.register_pytree_node_class
class HaloAffineOps:
    """Halo-exchange sharded (M, A, J, J^T) matvecs + a fused PCG.

    ``matvec`` surfaces operate on PERMUTED sharded vectors
    (``(ndev*nb,)`` velocity / ``(ndev*nbp,)`` pressure, sharded
    ``P(axis)``); translate with :meth:`to_perm` / :meth:`from_perm`.
    """

    _build = None

    _aux_names = ("mesh", "axis", "aux_local", "nin", "npc", "nb",
                  "nbp", "h", "hp", "in_specs")

    def __init__(self, aff=None, mesh=None, axis="elem",
                 _leaves=None, _aux=None):
        if _leaves is not None:
            (self.leaves, self.newv_d, self.newp_d) = _leaves
            for n, v in zip(self._aux_names, _aux):
                setattr(self, n, v)
            return
        self.mesh = mesh
        self.axis = axis
        ndev = mesh.shape[axis]
        leaves, aux = aff.tree_flatten()
        names = AffineVectorOps._leaf_names
        lv = dict(zip(names, [None if x is None else np.asarray(x)
                              for x in leaves]))
        auxd = dict(zip(AffineVectorOps._aux_names, aux))
        nin, npc, blk = auxd["nin"], auxd["npc"], auxd["blk"]
        self.nin, self.npc = nin, npc
        vd, pd = lv["vdofs"], lv["pdofs"]
        nc = vd.shape[0]

        # ---- velocity band partition -----------------------------------
        newv = _rcm_perm(vd, nin)
        nb = -(-nin // ndev)
        self.nb = nb
        vreal = vd < nin
        vmapped = np.where(vreal, newv[np.minimum(vd, nin - 1)], 0)
        lo_e = np.where(vreal.any(1),
                        np.where(vreal, vmapped, np.iinfo(np.int64).max)
                        .min(1), 0)
        dev_e = np.minimum(lo_e // nb, ndev - 1)              # (nc,)

        # ---- pressure ownership + padded blocks ------------------------
        preal = pd < npc
        owner_p = np.full(npc, ndev, dtype=np.int64)
        for k in range(pd.shape[1]):
            m = preal[:, k]
            np.minimum.at(owner_p, pd[m, k], dev_e[m])
        owner_p = np.minimum(owner_p, ndev - 1)
        order_p = np.lexsort((np.arange(npc), owner_p))
        counts = np.bincount(owner_p, minlength=ndev)
        nbp = int(counts.max())
        self.nbp = nbp
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        newp = np.empty(npc, dtype=np.int64)
        pos_in_dev = np.arange(npc) - starts[owner_p[order_p]]
        newp[order_p] = owner_p[order_p] * nbp + pos_in_dev

        # ---- per-device element blocks (padded to equal count) ---------
        by_dev = [np.where(dev_e == d)[0] for d in range(ndev)]
        nc_loc = max(1, max(len(ix) for ix in by_dev))
        nc_loc = -(-nc_loc // blk) * blk
        sel = np.full((ndev, nc_loc), -1, dtype=np.int64)
        for d, ix in enumerate(by_dev):
            sel[d, : len(ix)] = ix
        dummy = sel < 0
        sel = np.maximum(sel, 0)

        # window-local index tables + halo widths
        vmap_full = np.concatenate([newv, [0]])
        vloc = vmap_full[np.minimum(vd[sel.reshape(-1)], nin)]
        vloc = vloc.reshape(ndev, nc_loc, -1) - (np.arange(ndev) * nb)[
            :, None, None]
        trash_v = vd[sel.reshape(-1)].reshape(ndev, nc_loc, -1) >= nin
        pmap_full = np.concatenate([newp, [0]])
        ploc = pmap_full[np.minimum(pd[sel.reshape(-1)], npc)]
        ploc = ploc.reshape(ndev, nc_loc, -1) - (np.arange(ndev) * nbp)[
            :, None, None]
        trash_p = pd[sel.reshape(-1)].reshape(ndev, nc_loc, -1) >= npc
        trash_p |= dummy[:, :, None]
        trash_v |= dummy[:, :, None]
        h = _halo_of(np.where(trash_v, 0, vloc), nb)
        hp = _halo_of(np.where(trash_p, 0, ploc), nbp)
        h = max(h, 1)
        hp = max(hp, 1)
        if h > nb or hp > nbp:
            raise ValueError(
                f"halo exceeds block ({h}>{nb} or {hp}>{nbp}): too many "
                "devices for this bandwidth — use the replicated/psum "
                "operators (parallel.spatial) instead")
        self.h, self.hp = h, hp
        win_v, win_p = nb + 2 * h, nbp + 2 * hp
        vloc = np.where(trash_v, win_v, vloc + h)
        ploc = np.where(trash_p, win_p, ploc + hp)

        # ---- facet elements --------------------------------------------
        fvd = lv["fac_vdofs"]
        nfac = fvd.shape[0]
        if nfac:
            freal = fvd < nin
            fmapped = np.where(freal, vmap_full[np.minimum(fvd, nin)], 0)
            flo = np.where(freal.any(1),
                           np.where(freal, fmapped,
                                    np.iinfo(np.int64).max).min(1), 0)
            fdev = np.minimum(flo // nb, ndev - 1)
            fby = [np.where(fdev == d)[0] for d in range(ndev)]
            nf_loc = max(1, max(len(ix) for ix in fby))
            fsel = np.full((ndev, nf_loc), -1, dtype=np.int64)
            for d, ix in enumerate(fby):
                fsel[d, : len(ix)] = ix
            fdummy = fsel < 0
            fsel = np.maximum(fsel, 0)
            floc = vmap_full[np.minimum(fvd[fsel.reshape(-1)], nin)]
            floc = (floc.reshape(ndev, nf_loc, -1)
                    - (np.arange(ndev) * nb)[:, None, None])
            ftrash = (fvd[fsel.reshape(-1)].reshape(ndev, nf_loc, -1)
                      >= nin) | fdummy[:, :, None]
            hf = _halo_of(np.where(ftrash, 0, floc), nb)
            if hf > h:
                raise ValueError(f"facet halo {hf} > element halo {h}")
            floc = np.where(ftrash, win_v, floc + h)
            fac_elem = lv["fac_elem"][fsel.reshape(-1)]
            fac_elem[fdummy.reshape(-1)] = 0.0
            fac_elem = fac_elem.reshape((ndev * nf_loc,)
                                        + lv["fac_elem"].shape[1:])
            fac_vdofs = floc.reshape(ndev * nf_loc, -1)
        else:
            fac_elem = lv["fac_elem"]
            fac_vdofs = fvd

        # ---- assemble the sharded leaf set -----------------------------
        def shard_elem(name, arr2d, fill=0.0):
            a = np.asarray(arr2d)[sel.reshape(-1)]
            a[dummy.reshape(-1)] = fill
            return a

        auxd = dict(auxd)
        auxd["nin"] = win_v
        auxd["npc"] = win_p
        auxd["nc"] = nc_loc
        self.aux_local = tuple(auxd[k] for k in AffineVectorOps._aux_names)

        def put_e(a):
            a = jnp.asarray(a)
            return jax.device_put(
                a, NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1)))))

        def put_r(a):
            return jax.device_put(jnp.asarray(a), NamedSharding(mesh, P()))

        placed = {}
        self.in_specs = []
        for n in AffineVectorOps._leaf_names:
            if lv[n] is None:
                placed[n] = None
                self.in_specs.append(None)
                continue
            if n == "vdofs":
                arr = put_e(vloc.reshape(ndev * nc_loc, -1))
            elif n == "pdofs":
                arr = put_e(ploc.reshape(ndev * nc_loc, -1))
            elif n == "fac_vdofs":
                arr = put_e(fac_vdofs)
            elif n == "fac_elem":
                arr = put_e(fac_elem)
            elif n in ("JinvT", "wdet", "detJ"):
                arr = put_e(shard_elem(n, lv[n]))
            else:                                   # constant ref tables
                arr = put_r(lv[n])
            placed[n] = arr
            self.in_specs.append(
                P(axis, *([None] * (arr.ndim - 1)))
                if n in ("vdofs", "pdofs", "fac_vdofs", "fac_elem",
                         "JinvT", "wdet", "detJ") else P())
        self.leaves = tuple(placed[n] for n in AffineVectorOps._leaf_names)
        self.in_specs = tuple(self.in_specs)

        # permutation maps as device arrays (replicated; O(n) but local)
        self.newv_d = put_r(newv)
        self.newp_d = put_r(newp)
        # host-side partition record, so other element kernels (the
        # convection assembly) can be sharded CONSISTENTLY with this
        # band decomposition (build-time only; not a pytree member —
        # unflattened copies carry None)
        self._build = dict(newv=newv, dev_e=dev_e)

    # -- pytree ----------------------------------------------------------
    def tree_flatten(self):
        return ((self.leaves, self.newv_d, self.newp_d),
                tuple(getattr(self, n) for n in self._aux_names))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(_leaves=children, _aux=aux)

    # -- layout helpers --------------------------------------------------
    @property
    def ndev(self):
        return self.mesh.shape[self.axis]

    def to_perm(self, x, pressure=False):
        new = self.newp_d if pressure else self.newv_d
        n_pad = (self.ndev * (self.nbp if pressure else self.nb))
        out = jnp.zeros((n_pad,), x.dtype).at[new].set(x.reshape(-1))
        return jax.device_put(
            out, NamedSharding(self.mesh, P(self.axis)))

    def from_perm(self, xp, pressure=False):
        new = self.newp_d if pressure else self.newv_d
        return xp[new]

    # -- halo plumbing (inside shard_map) --------------------------------
    def _win(self, xs, hw):
        """Local shard -> window (left halo | own | right halo)."""
        nd, ax = self.ndev, self.axis
        from_left = lax.ppermute(xs[-hw:], ax,
                                 [(i, i + 1) for i in range(nd - 1)])
        from_right = lax.ppermute(xs[:hw], ax,
                                  [(i + 1, i) for i in range(nd - 1)])
        return jnp.concatenate([from_left, xs, from_right])

    def _unwin(self, ow, hw, nb):
        """Window-sized accumulation -> owned shard (+ neighbour tails)."""
        nd, ax = self.ndev, self.axis
        to_left = lax.ppermute(ow[:hw], ax,
                               [(i + 1, i) for i in range(nd - 1)])
        to_right = lax.ppermute(ow[hw + nb: hw + nb + hw], ax,
                                [(i, i + 1) for i in range(nd - 1)])
        own = ow[hw: hw + nb]
        own = own.at[-hw:].add(to_left)
        own = own.at[:hw].add(to_right)
        return own

    def _apply(self, kind, cm, ca, x, in_p=False, out_p=False):
        aux_local = self.aux_local
        h, hp, nb, nbp = self.h, self.hp, self.nb, self.nbp
        hin, hout = (hp if in_p else h), (hp if out_p else h)
        nbo = nbp if out_p else nb

        def local(*args):
            lvs, xs = args[:-1], args[-1]
            la = AffineVectorOps.tree_unflatten(aux_local, lvs)
            xw = self._win(xs, hin)
            if kind == "ma":
                yw = la.ma_matvec(xw, cm, ca)
            elif kind == "m":
                yw = la.m_matvec(xw)
            elif kind == "j":
                yw = la.j_matvec(xw)
            else:
                yw = la.jt_matvec(xw)
            return self._unwin(yw, hout, nbo)

        return shard_map(
            local, mesh=self.mesh,
            in_specs=self.in_specs + (P(self.axis),),
            out_specs=P(self.axis),
        )(*self.leaves, x)

    # -- matvec surface (PERMUTED sharded vectors) -----------------------
    def m_matvec(self, x):
        return self._apply("m", 1.0, 0.0, x)

    def a_matvec(self, x):
        return self._apply("ma", 0.0, 1.0, x)

    def ma_matvec(self, x, cm, ca):
        return self._apply("ma", cm, ca, x)

    def j_matvec(self, x):
        return self._apply("j", 0.0, 0.0, x, out_p=True)

    def jt_matvec(self, q):
        return self._apply("jt", 0.0, 0.0, q, in_p=True)

    # -- fused PCG F-solve: ONE shard_map around the whole loop ----------
    def pcg_solve(self, b, dinv, cm, ca, niter):
        """Jacobi-PCG on ``(cm M + ca A) y = b`` entirely in the sharded
        layout: per iteration 2 ppermutes of ``h`` values (the operator
        halo) + 2 scalar ``psum`` — no O(n) collective anywhere.

        ``b``/``dinv`` are permuted sharded vectors; returns the same.
        """
        aux_local = self.aux_local
        h, nb, ax = self.h, self.nb, self.axis

        def local(*args):
            lvs, bs, ds = args[:-2], args[-2], args[-1]
            la = AffineVectorOps.tree_unflatten(aux_local, lvs)

            def fmv(xs):
                yw = la.ma_matvec(self._win(xs, h), cm, ca)
                return self._unwin(yw, h, nb)

            def dot(u, v):
                return lax.psum(jnp.dot(u, v), ax)

            x = jnp.zeros_like(bs)
            r = bs
            z = ds * r
            p = z
            rz = dot(r, z)

            def safediv(num, den):
                # 0/0 -> 0 without an additive eps (TPU-emulated f64
                # flushes tiny constants to zero)
                ok = den != 0
                return jnp.where(ok, num, 0.0) / jnp.where(ok, den, 1.0)

            def body(_, st):
                x, r, p, rz = st
                ap = fmv(p)
                alpha = safediv(rz, dot(p, ap))
                x = x + alpha * p
                r = r - alpha * ap
                z = ds * r
                rz_n = dot(r, z)
                p = z + safediv(rz_n, rz) * p
                return (x, r, p, rz_n)

            x, _, _, _ = lax.fori_loop(0, niter, body, (x, r, p, rz))
            return x

        return shard_map(
            local, mesh=self.mesh,
            in_specs=self.in_specs + (P(ax), P(ax)),
            out_specs=P(ax),
            check_rep=False,
        )(*self.leaves, b, dinv)


# ---------------------------------------------------------------------------
# halo-sharded convection kernel + the full halo CNAB step
# ---------------------------------------------------------------------------

from ..ops.convection import ConvectionKernel  # noqa: E402


class HaloConvKernel:
    """Band-partitioned :class:`~..ops.convection.ConvectionKernel`.

    Elements follow the SAME band decomposition as a built
    :class:`HaloAffineOps` (whose ``_build`` record supplies the RCM
    permutation and the element->device map, so the convection halo is
    guaranteed to fit the affine halo width ``h``).  Because the
    convection term is nonlinear in the *full* velocity field, each
    device's local gather window is extended with a replicated tail of
    the (static) Dirichlet boundary values:

        local input = [ window of inner dofs (nb + 2h) | bc values ]

    and the element dof tables are remapped into that layout.  One
    application = the window exchange already paid for the step's other
    matvecs + local quadrature + the standard halo return.
    """

    def __init__(self, kern: ConvectionKernel, halo: HaloAffineOps, prob,
                 banded=None):
        if halo._build is None:
            raise ValueError("halo must be a freshly built HaloAffineOps "
                             "(the partition record is build-time only)")
        mesh, axis = halo.mesh, halo.axis
        ndev = mesh.shape[axis]
        nb, h = halo.nb, halo.h
        win_v = nb + 2 * h
        leaves, aux = kern.tree_flatten()
        names = ("W1blk", "W2blk", "W2Tblk", "W3blk", "Nq", "dNq",
                 "JinvT", "wdet", "nodes", "vd", "vdofs_flat")
        lv = dict(zip(names, [np.asarray(x) for x in leaves]))
        auxd = dict(zip(("nv_full", "Q", "nvpc", "blk", "nc", "nc_real",
                         "dim"), aux))
        nc_real, blk = auxd["nc_real"], auxd["blk"]
        dev_e = halo._build["dev_e"]
        if len(dev_e) < nc_real:
            raise ValueError("affine/convection element tables disagree")
        dev_e = dev_e[:nc_real]
        newv = halo._build["newv"]

        nin = halo.nin
        nv_full = auxd["nv_full"]
        invinds = np.asarray(prob.invinds)
        full2in = np.full(nv_full + 1, -1, dtype=np.int64)
        full2in[invinds] = np.arange(nin, dtype=np.int64)
        bcids = np.setdiff1d(np.arange(nv_full), invinds)
        nbc = len(bcids)
        full2bc = np.full(nv_full + 1, -1, dtype=np.int64)
        full2bc[bcids] = np.arange(nbc, dtype=np.int64)
        self.bc_vals_host = np.asarray(prob.bc_full_vec(),
                                       np.float64)[bcids]
        nloc = win_v + nbc                       # local "nv_full"
        drop = nloc                              # kernel pad slot

        # per-device element selection, padded to a common blk multiple
        by_dev = [np.where(dev_e == d)[0] for d in range(ndev)]
        nc_loc = max(1, max(len(ix) for ix in by_dev))
        nc_loc = -(-nc_loc // blk) * blk
        sel = np.full((ndev, nc_loc), -1, dtype=np.int64)
        for d, ix in enumerate(by_dev):
            sel[d, : len(ix)] = ix
        dummy = sel < 0
        sel = np.maximum(sel, 0)

        vd = lv["vd"][:nc_real]                  # (nc_real, nd) full ids
        vd_sel = vd[sel.reshape(-1)].reshape(ndev, nc_loc, -1)
        inn = full2in[np.minimum(vd_sel, nv_full)]
        isbc = full2bc[np.minimum(vd_sel, nv_full)]
        off_dev = (np.arange(ndev) * nb)[:, None, None]
        vloc_in = np.where(inn >= 0, newv[np.maximum(inn, 0)], 0) - off_dev
        hneed = _halo_of(np.where((inn >= 0) & ~dummy[:, :, None],
                                  vloc_in, 0), nb)
        if hneed > h:
            raise ValueError(f"convection halo {hneed} > affine halo {h}")
        vloc = np.where(inn >= 0, vloc_in + h,
                        np.where(isbc >= 0, win_v + isbc, drop))
        vloc = np.where(dummy[:, :, None], drop, vloc)

        # sort each device's elements by the mean WINDOW position of
        # their interior dofs (the ops/banded_conv.py ordering, applied
        # per shard): interior couplings then fit a static column
        # window.  Consistent permutation of the dof tables and the
        # element-data slices — harmless for the index pipeline,
        # prerequisite for the banded tail below.  Applied even when
        # the tail gate later declines (the gate needs the sorted
        # windows to predict its cost): this changes the segment_sum
        # summation ORDER, i.e. bit-level results differ from unsorted
        # builds by roundoff only — an intentional, documented
        # reproducibility trade (ADVICE r3).
        emsk = vloc < win_v
        mpos = (np.where(emsk, vloc, 0).sum(2)
                / np.maximum(emsk.sum(2), 1)).astype(np.float64)
        mpos[~emsk.any(2)] = win_v
        eorder = np.argsort(mpos, axis=1, kind="stable")
        vloc = np.take_along_axis(vloc, eorder[:, :, None], 1)
        sel = np.take_along_axis(sel, eorder, 1)
        dummy = np.take_along_axis(dummy, eorder, 1)

        def slice_e(arr, fill=0.0):
            a = arr[:nc_real][sel.reshape(-1)].copy()
            a[dummy.reshape(-1)] = fill
            return a

        def put_e(a):
            a = jnp.asarray(a)
            return jax.device_put(
                a, NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1)))))

        def put_r(a):
            return jax.device_put(jnp.asarray(a), NamedSharding(mesh, P()))

        placed, specs = [], []
        for n in names:
            if n == "vd":
                arr = put_e(vloc.reshape(ndev * nc_loc, -1))
            elif n == "vdofs_flat":
                # travels in (nc, nd) layout; flattened inside shard_map
                arr = put_e(vloc.reshape(ndev * nc_loc, -1))
            elif n == "nodes":
                arr = put_e(slice_e(lv[n], fill=0))
            elif n in ("JinvT", "wdet"):
                arr = put_e(slice_e(lv[n]))
            else:
                arr = put_r(lv[n])
            placed.append(arr)
            specs.append(P(axis, *([None] * (arr.ndim - 1)))
                         if n in ("vd", "vdofs_flat", "nodes", "JinvT",
                                  "wdet") else P())
        self.leaves = tuple(placed)
        self.in_specs = tuple(specs)
        auxd["nv_full"] = nloc
        auxd["nc"] = nc_loc
        auxd["nc_real"] = nc_loc
        self.aux_local = tuple(auxd[k] for k in
                               ("nv_full", "Q", "nvpc", "blk", "nc",
                                "nc_real", "dim"))
        self.bc_vals = put_r(self.bc_vals_host)
        self.win_v = win_v
        self.b_leaves = None
        self._build_banded_tail(vloc, win_v, nbc, mesh, axis, banded,
                                np.dtype(kern.wdet.dtype))

    def _build_banded_tail(self, vloc, win_v, nbc, mesh, axis, banded,
                           bdtype):
        """Per-shard banded convection tail (ops/banded_conv.py, applied
        device-local): with each device's elements sorted along its
        window, the 0/1 scatter ``S (win_v, nvals)`` / gather
        ``G (nvals, win_v)`` matrices are static-window banded, so the
        local convection assembly becomes two banded matmuls around the
        quadrature contraction — the per-dof gather and ``segment_sum``
        scatter (the TPU-hostile index ops, docs/PERF_NOTES.md section
        10) leave the halo hot loop.  Window bases are unified across
        devices (max span) so the SPMD program stays static; the RCM
        band structure is near-identical per shard, so the inflation is
        small.  ``banded``: True forces, False disables, None gates on
        the predicted HBM stream cost (same model as
        :func:`..ops.banded_conv.build_banded_conv_tail`).
        """
        if banded is False or (banded is None and os.environ.get(
                "DNS_TPU_BANDED_CONV", "1") == "0"):
            return
        import scipy.sparse as sps

        ndev, nc_loc, nd = vloc.shape
        nvals = nc_loc * nd
        bs = 256
        nblk_s = max(1, -(-win_v // bs))
        nblk_g = max(1, -(-nvals // bs))
        cols = np.broadcast_to(
            np.arange(nvals).reshape(nc_loc, nd), vloc.shape)
        keep = vloc < win_v

        def spans(rows, cls, nblk):
            lo = np.full(nblk, np.iinfo(np.int64).max)
            hi = np.full(nblk, -1)
            if rows.size:
                np.minimum.at(lo, rows // bs, cls)
                np.maximum.at(hi, rows // bs, cls)
            return lo, hi

        def unify(per_dev, ncols):
            lo = np.minimum.reduce([l for l, _ in per_dev])
            hi = np.maximum.reduce([h for _, h in per_dev])
            empty = hi < 0
            lo[empty], hi[empty] = 0, 0
            w = int((hi - lo + 1).max())
            w = max(128, -(-w // 128) * 128)
            pad = max(ncols, w)
            bases = tuple(int(min(max(b, 0), pad - w)) for b in lo)
            return bases, w, pad

        sbases, wS, spad = unify(
            [spans(vloc[d][keep[d]], cols[d][keep[d]], nblk_s)
             for d in range(ndev)], nvals)
        gbases, wG, gpad = unify(
            [spans(cols[d][keep[d]], vloc[d][keep[d]], nblk_g)
             for d in range(ndev)], win_v)

        if banded is not True:
            from ..ops.banded_conv import banded_wins

            by = (nblk_s * bs * wS + nblk_g * bs * wG) * bdtype.itemsize
            max_gb = float(os.environ.get("DNS_TPU_BANDED_CONV_MAXGB",
                                          "1.0"))
            # shared cost model (ops/banded_conv.py module head); the
            # pipeline being replaced scales with the PER-SHARD element
            # values nvals = nc_loc * nd, not window dofs (ADVICE r3)
            if by > max_gb * 1e9 or not banded_wins(by, nvals=nvals):
                return

        Sb = np.zeros((ndev, nblk_s, bs, wS), bdtype)
        Gb = np.zeros((ndev, nblk_g, bs, wG), bdtype)
        for d in range(ndev):
            r, c = vloc[d][keep[d]], cols[d][keep[d]]
            Sd = sps.coo_matrix(
                (np.ones(len(r)), (r, c)), shape=(win_v, nvals)).tocsr()
            Gd = Sd.T.tocsr()
            for k, b in enumerate(sbases):
                sub = Sd[k * bs: min((k + 1) * bs, win_v),
                         b: min(b + wS, nvals)].toarray()
                Sb[d, k, : sub.shape[0], : sub.shape[1]] = sub
            for k, b in enumerate(gbases):
                sub = Gd[k * bs: min((k + 1) * bs, nvals),
                         b: min(b + wG, win_v)].toarray()
                Gb[d, k, : sub.shape[0], : sub.shape[1]] = sub

        # constant element field from the frozen Dirichlet tail
        # (interior-window positions contribute via G instead)
        nloc = win_v + nbc
        vpad = np.zeros(nloc + 1)
        vpad[win_v:nloc] = self.bc_vals_host
        ue_bc = vpad[np.minimum(vloc, nloc)].astype(bdtype)

        def put_e(a):
            a = jnp.asarray(a)
            return jax.device_put(a, NamedSharding(
                mesh, P(axis, *([None] * (a.ndim - 1)))))

        self.b_leaves = (put_e(Sb), put_e(Gb), put_e(ue_bc))
        self.b_specs = (P(axis, None, None, None),
                        P(axis, None, None, None),
                        P(axis, None, None))
        self.b_meta = dict(sbases=sbases, wS=wS, spad=spad,
                           gbases=gbases, wG=wG, gpad=gpad, nvals=nvals)


def _banded_conv_local(lk, Sb, Gb, ue_bc, meta, win_v, xw):
    """Device-local banded convection application: window velocity
    ``xw (win_v,)`` -> window loads ``(win_v,)`` via G-matmul ->
    quadrature contraction (same math as ``ConvectionKernel.vector``,
    reference dolfin_to_sparrays.py:427-472) -> S-matmul."""
    from ..solve.sadpnt import _rect_mv

    dt = lk.wdet.dtype
    ue = _rect_mv(Gb, meta["gbases"], meta["wG"], meta["nvals"],
                  meta["gpad"], xw.astype(dt))
    ue = ue.reshape(lk.nc, -1) + ue_bc
    uq = lk._bmm(ue, lk.W1blk, lk.dim * lk.Q).reshape(
        lk.nc, lk.Q, lk.dim)
    rg = lk._bmm(ue, lk.W2blk, lk.dim * lk.dim * lk.Q).reshape(
        lk.nc, lk.Q, lk.dim, lk.dim)
    guq = jnp.einsum("edk,eqkc->eqcd", lk.JinvT, rg)
    conv = jnp.einsum("eqd,eqcd->eqc", uq, guq)
    wconv = (lk.wdet[:, :, None] * conv).reshape(lk.nc, lk.dim * lk.Q)
    fe = lk._bmm(wconv, lk.W3blk, lk.dim * lk.nvpc)
    return _rect_mv(Sb, meta["sbases"], meta["wS"], win_v,
                    meta["spad"], fe.reshape(-1))


def make_halo_cnab_step(prob, dt, mesh, axis="elem", theta=0.5,
                        dtype=jnp.float64, banded_conv=None):
    """Build the fully-sharded halo CNAB machinery: the state never
    leaves the permuted band-sharded layout; all per-step work (nonlinear
    convection assembly, A-matvec, the nested matrix-free block-Schur
    solve) runs device-local with O(bandwidth) ``ppermute`` exchanges
    and scalar ``psum`` reductions — no O(n) collective anywhere.

    This is the matrix-free large-mesh regime: no dense Schur factors
    (the per-chip memory is O(elements/ndev)), so it has no single-chip
    HBM ceiling at all; the price is nested PCG per step.  Use the
    dense-factor paths (:func:`make_sharded_cnab_step` /
    :class:`ShardedSchurSolver`) below their memory limits.

    Returns ``(halo, hconv, bundle)``; drive with :func:`halo_cnab_scan`.
    """
    import scipy.sparse as sps

    aff = prob.affine_ops(dtype)
    halo = HaloAffineOps(aff, mesh, axis)
    kern = ConvectionKernel(prob.ctx, dtype=dtype)
    hconv = HaloConvKernel(kern, halo, prob, banded=banded_conv)

    F = sps.csr_matrix(prob.Mc + theta * dt * prob.Ac)
    dinvF = 1.0 / np.asarray(F.diagonal()).ravel()
    J = sps.csr_matrix(prob.Jc)
    # Jacobi seed for the BFBt pressure operator diag(J diag(F)^-1 J^T)
    dS = np.asarray(J.multiply(J) @ dinvF).ravel()
    dinvS = np.where(dS > 0, 1.0 / np.where(dS > 0, dS, 1.0), 0.0)
    # Cahouet-Chabard mass term: S^-1 ~ Lp^-1 + theta dt nu Mp^-1
    dMp = np.asarray(prob.MP.diagonal()).ravel()[: prob.np_cond]
    dinvMp = theta * dt * float(prob.nu) / dMp
    bundle = dict(
        fv=halo.to_perm(jnp.asarray(np.asarray(prob.fv).ravel())),
        fp=halo.to_perm(jnp.asarray(np.asarray(prob.fp).ravel()),
                        pressure=True),
        dinvF=halo.to_perm(jnp.asarray(dinvF)),
        dinvS=halo.to_perm(jnp.asarray(dinvS), pressure=True),
        dinvMp=halo.to_perm(jnp.asarray(dinvMp), pressure=True),
        bc_vals=hconv.bc_vals,
    )
    return halo, hconv, bundle


def mf_schur_cnab_ops(pcgs, consts):
    """The layout-agnostic increment-form CNAB step with the MATRIX-FREE
    block-Schur solve, shared by the halo-sharded scan and its serial
    twin (the test oracle): ``pcgs`` provides the operator callables
    (``fmv, amv, jmv, jtmv, conv, pcg, fcg_s``), ``consts`` the vectors.

    The Schur complement ``S = J F^-1 J^T`` is solved by a flexible CG
    whose preconditioner is Cahouet-Chabard-like (stokes pressure
    convection-diffusion analysis): ``S^-1 ~ Lp^-1 + theta dt nu Mp^-1``
    with the discrete pressure Laplacian ``Lp = J diag(F)^-1 J^T``
    applied matrix-free and inverted by a few inner Jacobi-CG rounds —
    every piece rides the same O(halo) operator applications.

    Warm starts: the three solve results (y, q, x) are carried between
    steps; consecutive increment systems differ by O(dt), so each step
    continues converging the previous step's solution.
    """
    dt, theta = consts["dt"], consts["theta"]
    fv, fp = consts["fv"], consts["fp"]
    dinvF = consts["dinvF"]
    nf = consts["niter_f"]

    def step(carry, _):
        v, nfc_o, y0, q0, x0 = carry
        nfc_c = -pcgs["conv"](v)
        rhs = (-dt * pcgs["amv"](v)
               + 0.5 * dt * (3.0 * nfc_c - nfc_o) + dt * fv)
        rp = fp - pcgs["jmv"](v)
        y = pcgs["pcg"](pcgs["fmv"], dinvF, rhs, nf, y0)
        g = pcgs["jmv"](y) - rp
        q = pcgs["fcg_s"](g, q0)
        x = pcgs["pcg"](pcgs["fmv"], dinvF, pcgs["jtmv"](q), nf, x0)
        return (v + y - x, nfc_c, y, q, x), None

    return step


def mf_solvers(dot, fmv, jmv, jtmv, dinvF, dinvS, dinvMp,
               niter_f=30, niter_s=12, niter_lp=25):
    """Build the (warm-startable) Jacobi-PCG and the Cahouet-Chabard-
    preconditioned flexible CG on the Schur complement from the operator
    callables — layout-agnostic (``dot`` supplies the reduction: a plain
    ``jnp.dot`` serially, ``psum(dot)`` in the halo-sharded layout)."""

    def safediv(num, den):
        # branchless 0/0 -> 0: a zero denominator only occurs with a
        # zero search direction (converged / zero rhs).  NOTE: an
        # additive eps (x + 1e-300) is NOT safe here — TPU-emulated f64
        # flushes it to zero and the NaN returns.
        ok = den != 0
        return jnp.where(ok, num, 0.0) / jnp.where(ok, den, 1.0)

    def pcg(mv, dinv, b, niter, x0=None):
        x = jnp.zeros_like(b) if x0 is None else x0
        r = b if x0 is None else b - mv(x0)
        z = dinv * r
        p = z
        rz = dot(r, z)

        def body(_, st):
            x, r, p, rz = st
            ap = mv(p)
            alpha = safediv(rz, dot(p, ap))
            x = x + alpha * p
            r = r - alpha * ap
            z = dinv * r
            rz_n = dot(r, z)
            p = z + safediv(rz_n, rz) * p
            return (x, r, p, rz_n)

        return lax.fori_loop(0, niter, body, (x, r, p, rz))[0]

    def lp_mv(q):
        # discrete pressure Laplacian (BFBt form): J diag(F)^-1 J^T
        return jmv(dinvF * jtmv(q))

    def prec_s(r):
        return pcg(lp_mv, dinvS, r, niter_lp) + dinvMp * r

    def s_apply(q):
        return jmv(pcg(fmv, dinvF, jtmv(q), niter_f))

    def fcg_s(b, x0):
        # flexible PCG (Polak-Ribiere beta): the inner-CG preconditioner
        # is not a fixed linear operator
        x = x0
        r = b - s_apply(x0)
        z = prec_s(r)
        p = z
        rz = dot(r, z)

        def body(_, st):
            x, r, p, rz = st
            ap = s_apply(p)
            alpha = safediv(rz, dot(p, ap))
            x = x + alpha * p
            r_n = r - alpha * ap
            z_n = prec_s(r_n)
            beta = safediv(dot(z_n, r_n - r), rz)
            p = z_n + beta * p
            return (x, r_n, p, dot(r_n, z_n))

        return lax.fori_loop(0, niter_s, body, (x, r, p, rz))[0]

    return pcg, fcg_s


def halo_cnab_scan(halo, hconv, bundle, v0p, nsteps, dt, theta=0.5,
                   niter_f=30, niter_s=12, niter_lp=25):
    """Run ``nsteps`` increment-form CNAB steps entirely inside ONE
    ``shard_map``: carry = (sharded velocity, sharded AB2 convection,
    warm-start solves).

    Per step: 1 convection assembly + 1 A-matvec + the matrix-free
    block-Schur solve (warm F-solve, ``niter_s`` Cahouet-Chabard-
    preconditioned flexible-CG Schur iterations whose operator is
    J F^-1 J^T with an inner ``niter_f`` F-PCG, final warm F-solve) —
    every operator application exchanges only the halo.

    Returns the final sharded velocity (``from_perm`` to read it).
    """
    aux_a, aux_c = halo.aux_local, hconv.aux_local
    h, hp, nb, nbp, ax = halo.h, halo.hp, halo.nb, halo.nbp, halo.axis
    win_v = hconv.win_v
    cm, ca = 1.0, theta * dt
    na, nc_ = len(halo.leaves), len(hconv.leaves)
    bnd = hconv.b_leaves is not None
    b_leaves = hconv.b_leaves if bnd else ()
    b_specs = hconv.b_specs if bnd else ()
    nb_ = len(b_leaves)

    def local(*args):
        la_lv = args[:na]
        lc_lv = list(args[na: na + nc_])
        b_lv = args[na + nc_: na + nc_ + nb_]
        (bc_vals, fv, fp, dinvF, dinvS, dinvMp, v0,
         nfc0) = args[na + nc_ + nb_:]
        la = AffineVectorOps.tree_unflatten(aux_a, la_lv)
        lc_lv[-1] = lc_lv[-1].reshape(-1)
        lk = ConvectionKernel.tree_unflatten(aux_c, tuple(lc_lv))

        def win(xs, hw):
            from_left = lax.ppermute(
                xs[-hw:], ax,
                [(i, i + 1) for i in range(halo.ndev - 1)])
            from_right = lax.ppermute(
                xs[:hw], ax,
                [(i + 1, i) for i in range(halo.ndev - 1)])
            return jnp.concatenate([from_left, xs, from_right])

        def unwin(ow, hw, nbo):
            to_left = lax.ppermute(
                ow[:hw], ax,
                [(i + 1, i) for i in range(halo.ndev - 1)])
            to_right = lax.ppermute(
                ow[hw + nbo: hw + nbo + hw], ax,
                [(i, i + 1) for i in range(halo.ndev - 1)])
            own = ow[hw: hw + nbo]
            own = own.at[-hw:].add(to_left)
            own = own.at[:hw].add(to_right)
            return own

        def fmv(xs):
            return unwin(la.ma_matvec(win(xs, h), cm, ca), h, nb)

        def amv(xs):
            return unwin(la.ma_matvec(win(xs, h), 0.0, 1.0), h, nb)

        def jmv(xs):
            return unwin(la.j_matvec(win(xs, h)), hp, nbp)

        def jtmv(qs):
            return unwin(la.jt_matvec(win(qs, hp)), h, nb)

        def conv(xs):
            xw = win(xs, h)
            if bnd:
                y = _banded_conv_local(lk, b_lv[0][0], b_lv[1][0],
                                       b_lv[2][0], hconv.b_meta,
                                       win_v, xw)
            else:
                y = lk.vector(jnp.concatenate([xw, bc_vals]))[:win_v]
            return unwin(y, h, nb)

        def dot(u, v):
            return lax.psum(jnp.dot(u, v), ax)

        pcg, fcg_s = mf_solvers(dot, fmv, jmv, jtmv, dinvF, dinvS,
                                dinvMp, niter_f, niter_s, niter_lp)
        step = mf_schur_cnab_ops(
            dict(fmv=fmv, amv=amv, jmv=jmv, jtmv=jtmv, conv=conv,
                 pcg=pcg, fcg_s=fcg_s),
            dict(dt=dt, theta=theta, fv=fv, fp=fp, dinvF=dinvF,
                 niter_f=niter_f))

        c0 = (v0, nfc0, jnp.zeros_like(v0), jnp.zeros_like(fp),
              jnp.zeros_like(v0))
        (v, _, _, _, _), _ = lax.scan(step, c0, None, length=nsteps)
        return v

    # bootstrap the AB2 "previous" convection at v0 (one application in
    # its own small shard_map, matching the serial cnab hand-off)
    def conv_init(*args):
        lc_lv = list(args[:nc_])
        b_lv = args[nc_: nc_ + nb_]
        bc_vals, xs = args[nc_ + nb_:]
        lc_lv[-1] = lc_lv[-1].reshape(-1)
        lk = ConvectionKernel.tree_unflatten(aux_c, tuple(lc_lv))
        from_left = lax.ppermute(
            xs[-h:], ax, [(i, i + 1) for i in range(halo.ndev - 1)])
        from_right = lax.ppermute(
            xs[:h], ax, [(i + 1, i) for i in range(halo.ndev - 1)])
        xw = jnp.concatenate([from_left, xs, from_right])
        if bnd:
            ow = _banded_conv_local(lk, b_lv[0][0], b_lv[1][0],
                                    b_lv[2][0], hconv.b_meta, win_v, xw)
        else:
            ow = lk.vector(jnp.concatenate([xw, bc_vals]))[:win_v]
        to_left = lax.ppermute(
            ow[:h], ax, [(i + 1, i) for i in range(halo.ndev - 1)])
        to_right = lax.ppermute(
            ow[h + nb: h + nb + h], ax,
            [(i, i + 1) for i in range(halo.ndev - 1)])
        own = ow[h: h + nb]
        own = own.at[-h:].add(to_left)
        own = own.at[:h].add(to_right)
        return -own

    nfc0 = shard_map(
        conv_init, mesh=halo.mesh,
        in_specs=hconv.in_specs + b_specs + (P(), P(ax)),
        out_specs=P(ax), check_rep=False,
    )(*hconv.leaves, *b_leaves, bundle["bc_vals"], v0p)

    return shard_map(
        local, mesh=halo.mesh,
        in_specs=(halo.in_specs + hconv.in_specs + b_specs
                  + (P(),) + (P(ax),) * 7),
        out_specs=P(ax), check_rep=False,
    )(*halo.leaves, *hconv.leaves, *b_leaves, bundle["bc_vals"],
      bundle["fv"], bundle["fp"], bundle["dinvF"], bundle["dinvS"],
      bundle["dinvMp"], v0p, nfc0)
