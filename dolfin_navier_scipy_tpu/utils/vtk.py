"""Paraview output: legacy-free XML VTU writer + PVD time series.

Replaces the reference's ``output_paraview`` (data_output_utils.py:14-71,
which defers to ``dolfin.File``): velocity (P2, written at the P1
vertices + embedded midpoint refinement is overkill — we export the
P1-subsampled field, plus optional P2 point data on the quadratic
nodes) and pressure (P1) on the triangle mesh.
"""

import os
import xml.sax.saxutils as sax

import numpy as np


def write_vtu(fname, mesh, pointdata=None, celldata=None):
    """Write a triangle mesh with named point-data arrays to ASCII VTU.

    ``pointdata``: dict name -> (nverts,) scalars or (nverts, 2/3) vectors.
    ``celldata``: dict name -> (ncells,) scalars (e.g. DG0 pressure).
    """
    verts = mesh.verts
    cells = mesh.cells
    nv, nc = len(verts), len(cells)
    with open(fname, "w") as f:
        f.write('<?xml version="1.0"?>\n')
        f.write('<VTKFile type="UnstructuredGrid" version="0.1" '
                'byte_order="LittleEndian">\n<UnstructuredGrid>\n')
        f.write(f'<Piece NumberOfPoints="{nv}" NumberOfCells="{nc}">\n')
        f.write('<Points><DataArray type="Float64" NumberOfComponents="3" '
                'format="ascii">\n')
        gdim = verts.shape[1] if hasattr(verts, "shape") else len(verts[0])
        for row in verts:
            z = 0.0 if gdim == 2 else row[2]
            f.write(f"{row[0]} {row[1]} {z}\n")
        f.write("</DataArray></Points>\n<Cells>\n")
        f.write('<DataArray type="Int32" Name="connectivity" format="ascii">\n')
        npc = len(cells[0]) if nc else 3      # 3 = triangle, 4 = tet
        for c in cells:
            f.write(" ".join(str(int(ci)) for ci in c) + "\n")
        f.write('</DataArray>\n<DataArray type="Int32" Name="offsets" '
                'format="ascii">\n')
        for k in range(1, nc + 1):
            f.write(f"{npc * k}\n")
        f.write('</DataArray>\n<DataArray type="UInt8" Name="types" '
                'format="ascii">\n')
        f.write(("5\n" if npc == 3 else "10\n") * nc)
        f.write("</DataArray>\n</Cells>\n")
        f.write("<PointData>\n")
        for name, arr in (pointdata or {}).items():
            arr = np.asarray(arr)
            if arr.ndim == 1:
                f.write(f'<DataArray type="Float64" Name="{sax.escape(name)}"'
                        ' format="ascii">\n')
                for v in arr:
                    f.write(f"{v}\n")
            else:
                ncomp = 3
                f.write(f'<DataArray type="Float64" Name="{sax.escape(name)}"'
                        f' NumberOfComponents="{ncomp}" format="ascii">\n')
                for row in arr:
                    z = 0.0 if arr.shape[1] == 2 else row[2]
                    f.write(f"{row[0]} {row[1]} {z}\n")
            f.write("</DataArray>\n")
        f.write("</PointData>\n")
        f.write("<CellData>\n")
        for name, arr in (celldata or {}).items():
            f.write(f'<DataArray type="Float64" Name="{sax.escape(name)}"'
                    ' format="ascii">\n')
            for v in np.asarray(arr).ravel():
                f.write(f"{v}\n")
            f.write("</DataArray>\n")
        f.write("</CellData>\n</Piece>\n</UnstructuredGrid>\n</VTKFile>\n")


class PVDWriter:
    """``.pvd`` time-series writer with time filtering (the reference's
    ``tfilter`` subsampling, data_output_utils.py:29-35)."""

    def __init__(self, prefix, prob, tfilter=None):
        self.prefix = prefix
        self.prob = prob
        self.tfilter = None if tfilter is None else list(tfilter)
        self.entries = []
        os.makedirs(os.path.dirname(prefix) or ".", exist_ok=True)

    def _vertex_velocity(self, vf):
        """P2: vertex dofs lead; CR: average incident edge-midpoint values."""
        space = self.prob.space
        mesh = space.mesh
        nv = mesh.num_verts
        if getattr(space, "scheme", "TH") == "TH":
            return vf[:nv]
        if getattr(space, "dim", 2) != 2:
            raise NotImplementedError("CR vertex averaging is 2D-only")
        # CR: accumulate edge values onto their two vertices
        acc = np.zeros((nv, vf.shape[1]))
        cnt = np.zeros(nv)
        for (a, b), node in space.edge_to_node.items():
            acc[a] += vf[node]
            acc[b] += vf[node]
            cnt[a] += 1
            cnt[b] += 1
        return acc / np.maximum(cnt, 1)[:, None]

    def write(self, v_full=None, p=None, t=0.0):
        if self.tfilter is not None:
            if not self.tfilter or t < self.tfilter[0]:
                return
            self.tfilter.pop(0)
        prob = self.prob
        data, cdata = {}, {}
        if v_full is not None:
            dim = getattr(prob.space, "dim", 2)
            vf = np.asarray(v_full).reshape(-1, dim)
            data["velocity"] = self._vertex_velocity(vf)
        if p is not None:
            p = np.asarray(p).ravel()
            if prob.geo.ppin is not None and len(p) == prob.np_cond:
                p = np.concatenate([p, [0.0]])
            if getattr(prob.space, "scheme", "TH") == "TH":
                data["pressure"] = p
            else:
                # DG0 pressure IS piecewise-constant cell data — write it
                # as such (no lossy vertex averaging)
                cdata["pressure"] = p
        fname = f"{self.prefix}_{len(self.entries):06d}.vtu"
        write_vtu(fname, prob.space.mesh, data, celldata=cdata)
        self.entries.append((t, os.path.basename(fname)))

    def close(self):
        with open(self.prefix + ".pvd", "w") as f:
            f.write('<?xml version="1.0"?>\n<VTKFile type="Collection" '
                    'version="0.1">\n<Collection>\n')
            for t, fn in self.entries:
                f.write(f'<DataSet timestep="{t}" part="0" file="{fn}"/>\n')
            f.write("</Collection>\n</VTKFile>\n")


def output_paraview(prob=None, vp=None, vc=None, pc=None, t=None,
                    vfile=None, pfile=None, writeoutput=True, **kw):
    """Loose API-parity shim over :class:`PVDWriter`
    (reference data_output_utils.py:14-71)."""
    if not writeoutput or vfile is None:
        return
    vfile.write(v_full=vc, p=pc, t=t or 0.0)
