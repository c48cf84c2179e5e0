"""Misc parity: get_sysmats facade, dolfin-XML reader, caching, spectra."""

import gzip
import os

import numpy as np
import pytest

from dolfin_navier_scipy_tpu.models import get_sysmats


def test_get_sysmats_facade_merged():
    femp, mats, rhsd = get_sysmats(problem="drivencavity", nu=1e-2,
                                   meshparams=dict(N=6))
    assert mats["A"].shape[0] == len(femp["invinds"])
    assert rhsd["fv"].shape[0] == len(femp["invinds"])
    assert femp["Re"] == pytest.approx(100.0)


def test_get_sysmats_facade_split():
    out = get_sysmats(problem="drivencavity", nu=1e-2, mergerhs=False,
                      meshparams=dict(N=6))
    femp, mats, rhsd_vfrc, rhsd_stbc = out
    merged = rhsd_vfrc["fvc"] + rhsd_stbc["fv"]
    femp2, mats2, rhsd = get_sysmats(problem="drivencavity", nu=1e-2,
                                     meshparams=dict(N=6))
    assert np.allclose(merged, rhsd["fv"])


def test_dolfin_xml_reader(tmp_path):
    """Round-trip a synthetic dolfin XML mesh + facet-region file."""
    from dolfin_navier_scipy_tpu.mesh import (
        read_dolfin_xml,
        read_facet_region,
        unit_square,
    )

    ref = unit_square(3)
    xml = ['<?xml version="1.0"?>', "<dolfin>",
           f'<mesh celltype="triangle" dim="2">',
           f'<vertices size="{ref.num_verts}">']
    for i, (x, y) in enumerate(ref.verts):
        xml.append(f'<vertex index="{i}" x="{x}" y="{y}"/>')
    xml.append("</vertices>")
    xml.append(f'<cells size="{ref.num_cells}">')
    for i, (a, b, c) in enumerate(ref.cells):
        xml.append(f'<triangle index="{i}" v0="{a}" v1="{b}" v2="{c}"/>')
    xml.append("</cells></mesh></dolfin>")
    pth = tmp_path / "mesh.xml.gz"
    with gzip.open(pth, "wt") as f:
        f.write("\n".join(xml))
    m = read_dolfin_xml(str(pth))
    assert m.num_verts == ref.num_verts and m.num_cells == ref.num_cells
    _, det, _ = m.cell_jacobians()
    assert np.isclose(det.sum() / 2, 1.0)

    # facet region (mesh_value_collection format)
    fx = ['<?xml version="1.0"?>', "<dolfin>",
          '<mesh_value_collection type="uint" dim="1" size="2">']
    edges, cells, locs = m.boundary_edges()
    fx.append(f'<value cell_index="{cells[0]}" local_entity="{locs[0]}" '
              'value="7"/>')
    fx.append(f'<value cell_index="{cells[1]}" local_entity="{locs[1]}" '
              'value="7"/>')
    fx.append("</mesh_value_collection></dolfin>")
    fp = tmp_path / "facets.xml"
    fp.write_text("\n".join(fx))
    m = read_facet_region(m, str(fp))
    fc, fl = m.tagged_facets(7)
    assert len(fc) == 2


def test_steady_caching(tmp_path):
    from dolfin_navier_scipy_tpu.models import drivencavity_problem
    from dolfin_navier_scipy_tpu.solve import solve_steadystate_nse

    prob = drivencavity_problem(N=6, nu=1e-2)
    prfx = str(tmp_path / "cav")
    v1 = solve_steadystate_nse(prob, verbose=False, vel_nwtn_tol=1e-11,
                               save_data=True, data_prfx=prfx)
    # second call must load (no new kernels needed): poison the kernel
    prob._steady_kernel = "poisoned"
    v2 = solve_steadystate_nse(prob, verbose=False, vel_nwtn_tol=1e-11,
                               useolddata=True, data_prfx=prfx)
    assert np.allclose(v1, v2)
    prob._steady_kernel = None


def test_dae_pencil_spectra():
    from dolfin_navier_scipy_tpu.models import drivencavity_problem
    from dolfin_navier_scipy_tpu.solve import solve_steadystate_nse
    from dolfin_navier_scipy_tpu.utils.spectra import leading_evals

    prob = drivencavity_problem(N=5, nu=1e-1)
    vss = solve_steadystate_nse(prob, verbose=False, vel_nwtn_tol=1e-11)
    ev = leading_evals(prob, vss.ravel(), k=6, sigma=0.1)
    # the lid-driven cavity at Re=10 is linearly stable
    assert np.all(ev.real < 0)
