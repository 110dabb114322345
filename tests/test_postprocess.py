"""Postprocessing utilities (reference L5 layer)."""

import os

import numpy as np

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.io import save_trajectory_csv


def test_postanalysis_and_extract(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from fem_fct_pdeco_tpu.drivers.postprocess import extract_batch, postanalysis

    g = Grid(0.0, 1.0, 9)
    rng = np.random.default_rng(0)
    run = tmp_path / "run"
    run.mkdir()
    for name in ("u", "p", "c"):
        save_trajectory_csv(str(run / f"NL_{name}.csv"), rng.standard_normal((4, 9, 9)), g)
    postanalysis(str(run), "NL", 0.0, 1.0, 0.125)
    assert (run / "postanalysis.png").exists()

    extract_batch(str(run), "NL_u.csv", times=[0.2], dt=0.1, a1=0.0, a2=1.0, dx=0.125)
    assert (run / "NL_u_T0.2.csv").exists()
    # the extracted frame holds the VALUES of the source frame at t=0.2
    from fem_fct_pdeco_tpu.io.csvio import _parse_csv_floats, load_trajectory_csv

    src = load_trajectory_csv(str(run / "NL_u.csv"), g)
    got = _parse_csv_floats(str(run / "NL_u_T0.2.csv"))
    np.testing.assert_allclose(got, g.field_to_dof(src[2]), rtol=1e-12)


def test_plot_mesh(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from fem_fct_pdeco_tpu.drivers.postprocess import plot_mesh

    plot_mesh(0.0, 1.0, 0.25, out=str(tmp_path / "mesh.png"))
    assert (tmp_path / "mesh.png").exists()


def test_crop_and_resize_images(tmp_path):
    from PIL import Image

    from fem_fct_pdeco_tpu.drivers.postprocess import crop_images, resize_target_image

    img = Image.new("RGB", (64, 64), (120, 30, 200))
    p = tmp_path / "x.png"
    img.save(p)
    crop_images(str(tmp_path), (8, 8, 40, 40))
    assert (tmp_path / "x_cropped.png").exists()
    out = resize_target_image(str(p), nodes=81)
    assert Image.open(out).size == (9, 9)

    # image_to_field maps the grey range linearly onto [lo, hi]
    from fem_fct_pdeco_tpu.drivers.postprocess import image_to_field

    grad = Image.new("L", (9, 9))
    grad.putdata(list(range(0, 81 * 3, 3)))
    p2 = tmp_path / "g.png"
    grad.save(p2)
    f = image_to_field(str(p2), lo=1.0, hi=2.0)
    assert f.shape == (9, 9)
    assert abs(f.min() - 1.0) < 1e-6 and abs(f.max() - 2.0) < 1e-6
    assert np.all(np.diff(f.reshape(-1)) >= -1e-6)
