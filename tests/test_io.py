import os

import numpy as np
import pytest

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.io import (
    extract_frame,
    import_data_final,
    load_trajectory_csv,
    save_trajectory_csv,
)


def test_trajectory_roundtrip(tmp_path):
    g = Grid(0.0, 1.0, 9)
    rng = np.random.default_rng(0)
    traj = rng.standard_normal((5, 9, 9))
    p = str(tmp_path / "traj.csv")
    save_trajectory_csv(p, traj, g)
    back = load_trajectory_csv(p, g)
    np.testing.assert_allclose(back, traj, rtol=1e-15)


def test_import_data_final_and_extract(tmp_path):
    g = Grid(0.0, 1.0, 9)
    rng = np.random.default_rng(1)
    traj = rng.standard_normal((5, 9, 9))
    p = str(tmp_path / "run.csv")
    save_trajectory_csv(p, traj, g)
    # final frame slice
    frame = import_data_final(p, g, num_steps=4)
    np.testing.assert_allclose(frame, traj[4], rtol=1e-15)
    full = import_data_final(p, g, num_steps=4, time_dep=True)
    np.testing.assert_allclose(full, traj, rtol=1e-15)
    # extract_frame writes a single-frame file loadable as the final target
    out = extract_frame(str(tmp_path), "run", T=0.3, dt=0.1, grid=g)
    frame3 = import_data_final(out, g, num_steps=0)
    np.testing.assert_allclose(frame3, traj[3], rtol=1e-12)


def test_fastcsv_matches_numpy(tmp_path):
    from fem_fct_pdeco_tpu.io import _fastcsv

    rng = np.random.default_rng(2)
    vals = rng.standard_normal(10000) * 10.0 ** rng.integers(-8, 8, 10000).astype(float)
    p = str(tmp_path / "x.csv")
    vals.tofile(p, sep=",")
    got = _fastcsv.parse_file(p)
    want = np.genfromtxt(p, delimiter=",")
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_fastcsv_reads_reference_fixture():
    path = "/root/reference/data/solidbody_t0.25_u.csv"
    if not os.path.exists(path):
        pytest.skip("fixture unavailable")
    from fem_fct_pdeco_tpu.io import _fastcsv

    got = _fastcsv.parse_file(path)
    want = np.genfromtxt(path, delimiter=",")
    np.testing.assert_array_equal(got, want)


def test_fastcsv_multithreaded_matches_serial(tmp_path):
    """Forced chunked parsing (fastcsv_parse_mt) is bit-identical to the
    serial scan, including page-boundary tail handling."""
    import os

    import numpy as np

    from fem_fct_pdeco_tpu.io import _fastcsv

    rng = np.random.RandomState(7)
    vals = rng.randn(40_000) * np.exp(rng.randn(40_000) * 3)
    p = tmp_path / "mt.csv"
    with open(p, "w") as f:
        for i in range(0, len(vals), 9):
            f.write(",".join(repr(float(v)) for v in vals[i : i + 9]) + "\n")
    a1 = _fastcsv.parse_file(p, threads=1)
    a8 = _fastcsv.parse_file(p, threads=8)
    assert np.array_equal(a1, a8)
    assert np.array_equal(a1, vals)

    # exact page-size multiple ending in a digit (strtod overrun guard) and
    # in a separator (no token straddles the copied tail page)
    pg = os.sysconf("SC_PAGE_SIZE")
    for ending in ("9.25", "1.5,"):
        body = "1.5," * pg
        cut = pg * 2 - len(ending)
        cut -= cut % 4
        s = body[:cut] + "," * (pg * 2 - cut - len(ending)) + ending
        assert len(s) % pg == 0
        p2 = tmp_path / f"edge_{ending.strip(',')}.csv"
        p2.write_text(s)
        got = _fastcsv.parse_file(p2, threads=4)
        exp = np.array([float(x) for x in s.split(",") if x.strip()])
        assert np.array_equal(got, exp), ending


def test_fastcsv_page_boundary_tokens_not_dropped(tmp_path):
    """Exact-page-multiple files where the final page starts inside a token
    or after unparseable text: the last-separator split must parse every
    value exactly once (the old tail heuristic silently dropped a number
    whose start coincided with the copied-page boundary after an
    unparseable non-separator run)."""
    import os

    import numpy as np

    from fem_fct_pdeco_tpu.io import _fastcsv

    pg = os.sysconf("SC_PAGE_SIZE")

    # (a) unparseable x-run immediately followed (no separator) by a number
    # near the final-page boundary; file ends in a digit
    na = (pg - 8) // 4
    nb = (pg - 11) // 5
    s = "1.5," * na + "xxxx" + "9.25," * nb
    s += "x" * (2 * pg - len(s) - 4) + "3.75"
    assert len(s) == 2 * pg
    p = tmp_path / "a.csv"
    p.write_text(s)
    got = _fastcsv.parse_file(p, threads=4)
    exp = np.array([1.5] * na + [9.25] * nb + [3.75])
    assert np.array_equal(got, exp)

    # (b) one giant token spanning the entire final page (last separator is
    # in the first page): must be parsed once, entirely from the heap copy
    k = (pg // 2) // 4
    digits = 2 * pg - 4 * k - 2
    s2 = "1.5," * k + "9." + "0" * digits
    assert len(s2) == 2 * pg
    p2 = tmp_path / "b.csv"
    p2.write_text(s2)
    got2 = _fastcsv.parse_file(p2, threads=4)
    exp2 = np.array([1.5] * k + [9.0])
    assert np.array_equal(got2, exp2)


def test_streamed_generation_matches_unchunked(tmp_path):
    """Chunked target generation (generate_targets chunk_steps — the
    generation_mode analogue) is byte-identical to the unchunked writer,
    including a chunk boundary that does not divide the step count.
    Machine-precision equality: XLA compiles differently-sized scans to
    slightly different (mathematically equivalent) programs, so the last
    short chunk can differ in the final ulp."""
    import numpy as np

    from fem_fct_pdeco_tpu.drivers.generate_targets import chemotaxis

    d1 = str(tmp_path / "whole")
    d2 = str(tmp_path / "chunked")
    chemotaxis(d1, T=0.005, dt=1e-3, dx=0.025)           # 5 steps
    chemotaxis(d2, T=0.005, dt=1e-3, dx=0.025, chunk_steps=2)  # 2+2+1
    for name in ("chtxs_m_t0.005.csv", "chtxs_f_t0.005.csv"):
        a = np.array([float(x) for x in open(os.path.join(d1, name)).read().split(",")])
        b = np.array([float(x) for x in open(os.path.join(d2, name)).read().split(",")])
        assert a.shape == b.shape, name
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-13)


def test_native_writer_roundtrip(tmp_path):
    """The native multithreaded CSV writer (fastcsv_write_mt): values
    survive a write+parse round trip BIT-identically (shortest-round-trip
    formatting), the bytes are independent of the thread count, and
    append/lead_sep chunking reproduces the one-shot file exactly."""
    import numpy as np

    from fem_fct_pdeco_tpu.io import _fastcsv

    rng = np.random.RandomState(3)
    vals = np.concatenate([
        rng.randn(10000) * 10.0 ** rng.randint(-30, 30, 10000),
        np.array([0.0, -0.0, 1.0, -1.0, 0.1, 1e-300, 1e300, 123456789.0]),
    ])
    p1 = str(tmp_path / "a.csv")
    _fastcsv.write_file(vals, p1, threads=1)
    assert np.array_equal(_fastcsv.parse_file(p1), vals)

    p4 = str(tmp_path / "b.csv")
    _fastcsv.write_file(vals, p4, threads=4)
    assert open(p1, "rb").read() == open(p4, "rb").read()

    pc = str(tmp_path / "c.csv")
    _fastcsv.write_file(vals[:3000], pc, threads=4)
    _fastcsv.write_file(vals[3000:], pc, threads=4, append=True,
                        lead_sep=True)
    assert open(p1, "rb").read() == open(pc, "rb").read()


def test_save_trajectory_uses_native_writer(tmp_path):
    """save/append_trajectory_csv produce load-identical files through the
    native writer, including the chunked streaming path."""
    import numpy as np

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.io.csvio import (append_trajectory_csv,
                                            load_trajectory_csv,
                                            save_trajectory_csv)

    g = Grid(0.0, 1.0, 9)
    rng = np.random.RandomState(11)
    traj = rng.randn(5, 9, 9)
    p = str(tmp_path / "t.csv")
    save_trajectory_csv(p, traj, g)
    assert np.array_equal(load_trajectory_csv(p, g), traj)

    pa = str(tmp_path / "t2.csv")
    append_trajectory_csv(pa, traj[:2], g, first=True)
    append_trajectory_csv(pa, traj[2:], g)
    assert open(p, "rb").read() == open(pa, "rb").read()


def test_registry_schema_upgrade(tmp_path):
    """append_results_row upgrades an old-header registry in place when a
    new column appears (union header, old rows blank-filled) instead of
    silently appending misaligned fields."""
    import csv

    from fem_fct_pdeco_tpu.io import append_results_row

    p = str(tmp_path / "reg.csv")
    append_results_row(p, {"a": 1, "status": "ok"})
    append_results_row(p, {"a": 2, "new_col": 7.5, "status": "ok"})
    append_results_row(p, {"a": 3, "status": "ok"})  # fewer keys: blank fill
    with open(p, newline="") as f:
        rows = list(csv.DictReader(f))
    assert [r["a"] for r in rows] == ["1", "2", "3"]
    assert rows[0]["new_col"] == "" and rows[1]["new_col"] == "7.5"
    assert all(len(r) == 4 for r in rows)  # timestamp, a, status, new_col
