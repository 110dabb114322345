"""Post-processing utilities (reference L5 layer).

Equivalents of:
- advection_solidbody_postanalysis.py — load a finished PDECO run's CSVs and
  summarize/plot cost, control means and misfits.
- extract_data_FT_desired.py — batch frame extraction over parameter sweeps.
- crop_images.py — batch-crop saved plot images (PIL).
- plot_mesh.py — draw the triangulated mesh.
- data_helpers.generate_image — resize stored PNG targets to mesh resolution.

CLI:  python -m fem_fct_pdeco_tpu.drivers.postprocess <cmd> ...
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.io import extract_frame, load_trajectory_csv


def postanalysis(run_dir: str, prefix: str, a1: float, a2: float, dx: float,
                 out: str | None = None):
    """Summarize a finished PDECO run from its saved CSVs
    (advection_solidbody_postanalysis.py analogue)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    g = Grid.from_spacing(a1, a2, dx)
    series = {}
    for name in ("u", "v", "p", "q", "c"):
        path = os.path.join(run_dir, f"{prefix}_{name}.csv")
        if os.path.exists(path):
            series[name] = load_trajectory_csv(path, g)
    if not series:
        raise FileNotFoundError(f"no {prefix}_*.csv in {run_dir}")
    print(f"loaded {sorted(series)} from {run_dir}")
    fig, axes = plt.subplots(1, len(series), figsize=(5 * len(series), 4))
    for ax, (name, traj) in zip(np.atleast_1d(axes), sorted(series.items())):
        means = traj.reshape(traj.shape[0], -1).mean(axis=1)
        ax.plot(means)
        ax.set_title(f"mean {name}(t)")
        print(f"  {name}: frames={traj.shape[0]} final mean={means[-1]:.6e} "
              f"range=({traj.min():.3e}, {traj.max():.3e})")
    fig.tight_layout()
    fig.savefig(out or os.path.join(run_dir, "postanalysis.png"))
    plt.close(fig)


def extract_batch(data_dir: str, pattern: str, times: list[float], dt: float,
                  a1: float, a2: float, dx: float):
    """Batch frame-extraction over files/times
    (extract_data_FT_desired.py:18-37 analogue)."""
    g = Grid.from_spacing(a1, a2, dx)
    for path in sorted(glob.glob(os.path.join(data_dir, pattern))):
        name = os.path.splitext(os.path.basename(path))[0]
        for T in times:
            out = extract_frame(os.path.dirname(path), name, T, dt, g)
            print("wrote", out)


def crop_images(folder: str, box: tuple[int, int, int, int], suffix="_cropped"):
    """Batch-crop PNGs (crop_images.py analogue)."""
    from PIL import Image

    for path in sorted(glob.glob(os.path.join(folder, "*.png"))):
        img = Image.open(path)
        img.crop(box).save(path.replace(".png", f"{suffix}.png"))
        print("cropped", path)


def resize_target_image(img_path: str, nodes: int, out_path: str | None = None):
    """Resize a stored PNG target to match the mesh resolution
    (data_helpers.generate_image analogue)."""
    from PIL import Image

    pixel_dim = int(np.sqrt(nodes))
    if pixel_dim**2 != nodes:
        raise ValueError(f"{nodes} is not a perfect square")
    img = Image.open(img_path)
    img_re = img.resize((pixel_dim, pixel_dim))
    out_path = out_path or img_path.replace(".png", f"{pixel_dim}.png")
    img_re.save(out_path)
    print(f"wrote {out_path}")
    return out_path


def image_to_field(img_path: str, lo: float, hi: float) -> np.ndarray:
    """Greyscale-load an image and linearly map its pixel range to [lo, hi]
    (data_helpers get_data_image analogue) -> (n, n) field."""
    import matplotlib.image as mpimg

    rgb = mpimg.imread(img_path)
    grey = rgb.mean(axis=2) if rgb.ndim == 3 else rgb
    a, b = grey.min(), grey.max()
    return (hi - lo) / (b - a) * (grey - a) + lo


def plot_mesh(a1: float, a2: float, dx: float, out: str = "mesh.png"):
    """Draw the right-triangulated structured mesh (plot_mesh.py analogue)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    g = Grid.from_spacing(a1, a2, dx)
    X, Y = g.xy
    fig, ax = plt.subplots(figsize=(6, 6))
    for i in range(g.n):
        ax.plot([a1, a2], [Y[i, 0], Y[i, 0]], "k-", lw=0.3)
        ax.plot([X[0, i], X[0, i]], [a1, a2], "k-", lw=0.3)
    for k in range(-g.n + 1, g.n):  # the "right" diagonals
        x0 = max(a1, a1 - k * g.h)
        ax.plot([a1 + max(0, k) * g.h, a2 - max(0, -k) * g.h],
                [a1 + max(0, -k) * g.h, a2 - max(0, k) * g.h], "k-", lw=0.3)
    ax.set_aspect("equal")
    fig.savefig(out, dpi=150)
    plt.close(fig)
    print("wrote", out)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("postanalysis")
    p1.add_argument("run_dir"); p1.add_argument("prefix")
    p1.add_argument("--a1", type=float, required=True)
    p1.add_argument("--a2", type=float, required=True)
    p1.add_argument("--dx", type=float, required=True)
    p2 = sub.add_parser("extract")
    p2.add_argument("data_dir"); p2.add_argument("pattern")
    p2.add_argument("--times", type=float, nargs="+", required=True)
    p2.add_argument("--dt", type=float, required=True)
    p2.add_argument("--a1", type=float, required=True)
    p2.add_argument("--a2", type=float, required=True)
    p2.add_argument("--dx", type=float, required=True)
    p3 = sub.add_parser("crop")
    p3.add_argument("folder")
    p3.add_argument("--box", type=int, nargs=4, required=True)
    p4 = sub.add_parser("mesh")
    p4.add_argument("--a1", type=float, default=0.0)
    p4.add_argument("--a2", type=float, default=1.0)
    p4.add_argument("--dx", type=float, default=0.1)
    p4.add_argument("--out", default="mesh.png")
    args = ap.parse_args(argv)
    if args.cmd == "postanalysis":
        postanalysis(args.run_dir, args.prefix, args.a1, args.a2, args.dx)
    elif args.cmd == "extract":
        extract_batch(args.data_dir, args.pattern, args.times, args.dt,
                      args.a1, args.a2, args.dx)
    elif args.cmd == "crop":
        crop_images(args.folder, tuple(args.box))
    elif args.cmd == "mesh":
        plot_mesh(args.a1, args.a2, args.dx, args.out)


if __name__ == "__main__":
    main()
