"""CSV interop in the reference's on-disk layout.

The reference stores trajectories as ONE comma-separated line of
``(num_steps+1) * nodes`` values in FEniCS DoF ordering
(``ndarray.tofile(..., sep=",")``, e.g. Schnak_FCT_PDECO_refactored.py:271,
helpers.py:1366). Loaders/savers here convert between that layout and our
``(num_steps+1, n, n)`` vertex-ordered fields, so stored reference target
data and results are directly interchangeable.

A fast C++ float parser (fem_fct_pdeco_tpu.io._fastcsv) accelerates loading
of large trajectory files when built; numpy is the fallback.
"""

from __future__ import annotations

import os

import numpy as np

from fem_fct_pdeco_tpu.grid import Grid


def _parse_csv_floats(path: str) -> np.ndarray:
    try:
        from fem_fct_pdeco_tpu.io import _fastcsv

        return _fastcsv.parse_file(path)
    except Exception:
        return np.genfromtxt(path, delimiter=",")


def load_trajectory_csv(path: str, grid: Grid, num_steps: int | None = None) -> np.ndarray:
    """Load a flat DoF-ordered trajectory CSV -> (frames, n, n) vertex order."""
    data = _parse_csv_floats(path)
    nodes = grid.num_nodes
    if data.size % nodes != 0:
        raise ValueError(f"{path}: {data.size} values not divisible by {nodes} nodes")
    frames = data.size // nodes
    if num_steps is not None:
        frames = min(frames, num_steps + 1)
        data = data[: frames * nodes]
    return grid.field_from_dof(data.reshape(frames, nodes))


def _write_flat(flat: np.ndarray, path: str, append: bool = False,
                lead_sep: bool = False) -> None:
    """Write a flat value array in the reference's one-line CSV layout,
    through the native multithreaded writer when built (shortest
    round-trip formatting — values survive write+parse bit-identically);
    numpy ``tofile(sep=',')`` is the fallback. Both spellings parse to
    the same float64s."""
    try:
        from fem_fct_pdeco_tpu.io import _fastcsv

        _fastcsv.write_file(flat, path, append=append, lead_sep=lead_sep)
        return
    except Exception:
        pass
    if not append:
        flat.tofile(path, sep=",")
        return
    import shutil
    import tempfile

    with tempfile.NamedTemporaryFile(delete=False) as tf:
        tmp = tf.name
    flat.tofile(tmp, sep=",")
    with open(path, "ab") as out, open(tmp, "rb") as src:
        if lead_sep:
            out.write(b",")
        shutil.copyfileobj(src, out)
    os.remove(tmp)


def save_trajectory_csv(path: str, traj, grid: Grid) -> None:
    """Save (frames, n, n) vertex-ordered fields as a flat DoF-ordered CSV
    (the reference's ``tofile(..., sep=',')`` layout)."""
    traj = np.asarray(traj)
    flat = grid.field_to_dof(traj).reshape(-1)
    _write_flat(flat, path)


def append_trajectory_csv(path: str, traj, grid: Grid, first: bool = False) -> None:
    """Incrementally extend a flat DoF-ordered trajectory CSV with more
    frames (the streaming analogue of the reference's ``generation_mode``
    periodic dumps, helpers.py:1286-1318, 1360-1367). ``first=True`` starts
    the file. Bytes are produced by the same ``tofile(sep=',')`` writer as
    :func:`save_trajectory_csv`, so a chunked file is byte-identical to an
    unchunked one."""
    import shutil

    flat = grid.field_to_dof(np.asarray(traj)).reshape(-1)
    if first:
        flat.tofile(path, sep=",")
        return
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"append_trajectory_csv(first=False) on missing file {path!r}: "
            "appending would start the CSV with a separator (corrupt frame "
            "count); pass first=True for the opening chunk")
    tmp = path + ".part"
    flat.tofile(tmp, sep=",")
    with open(path, "ab") as out, open(tmp, "rb") as src:
        out.write(b",")
        shutil.copyfileobj(src, out)
    os.remove(tmp)


def import_data_final(
    path: str, grid: Grid, num_steps: int = 0, time_dep: bool = False
):
    """Reference ``import_data_final`` (helpers.py:1874-1911).

    time_dep=False: returns the single frame at index ``num_steps`` as an
    (n, n) field. time_dep=True: returns the first ``num_steps+1`` frames.
    """
    data = _parse_csv_floats(path)
    nodes = grid.num_nodes
    if time_dep:
        data = data[: (num_steps + 1) * nodes]
        return grid.field_from_dof(data.reshape(num_steps + 1, nodes))
    data = data[num_steps * nodes : (num_steps + 1) * nodes]
    return grid.field_from_dof(data)


def extract_frame(
    file_path: str, file_name: str, T: float, dt: float, grid: Grid
) -> str:
    """Reference ``extract_data`` (helpers.py:1913-1956): slice the frame at
    time T out of a trajectory CSV and save it as ``<name>_T{T}.csv``
    (still DoF-ordered, matching the reference's files)."""
    idx = round(T / dt)
    nodes = grid.num_nodes
    src = os.path.join(file_path, f"{file_name}.csv")
    dst = os.path.join(file_path, f"{file_name}_T{T}.csv")
    data = _parse_csv_floats(src)
    frame = data[idx * nodes : (idx + 1) * nodes]
    np.savetxt(dst, frame, delimiter=",")
    return dst
