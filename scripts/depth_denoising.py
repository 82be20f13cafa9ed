"""Depth-denoising comparison harness.

ROS-free reproduction of the reference's depth-denoising study
(reference: scripts/depth_denoising:18-91, scripts/compare_to_ddd): project
scans into range images, denoise the depth channel, and compare the
map-consistency loss of

- the raw scans,
- a range-image median denoiser (the in-framework stand-in for the external
  DeepDepthDenoising baseline, which needs its own trained weights), and
- the learned depth-correction model,

on the merged multi-view cloud. Appends ``depth_denoising.csv`` rows
``"<dataset> <loss_raw> <loss_median> <loss_corrected>"``.

Usage: python scripts/depth_denoising.py [--dataset NAME] [--out DIR]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def median_denoise_range_image(img, hit, size: int = 3):
    """Median filter over hit pixels (edge-preserving range smoothing)."""
    import jax.numpy as jnp

    h, w = img.shape
    pad = size // 2
    big = jnp.asarray(jnp.inf, img.dtype)
    stack = []
    for dy in range(-pad, pad + 1):
        for dx in range(-pad, pad + 1):
            v = jnp.roll(jnp.roll(img, dy, 0), dx, 1)
            m = jnp.roll(jnp.roll(hit, dy, 0), dx, 1)
            stack.append(jnp.where(m, v, big))
    vals = jnp.stack(stack)  # (size*size, H, W)
    # Masked median: sort (inf sinks misses to the end), take the middle of
    # the valid prefix.
    svals = jnp.sort(vals, axis=0)
    count = jnp.sum(jnp.isfinite(vals), axis=0)
    mid = jnp.maximum((count - 1) // 2, 0)
    med = jnp.take_along_axis(svals, mid[None], axis=0)[0]
    return jnp.where(hit & (count > 0), med, img)


def external_denoise_range_image(img, hit, command: str, workdir: str,
                                 scan_id: int = 0):
    """Run an EXTERNAL denoiser over one range image via a subprocess
    contract (the hookup the reference's compare_to_ddd study needs for the
    DeepDepthDenoising net; reference scripts/compare_to_ddd:1-165).

    Contract (``command`` is a format template):

    - ``{input_npz}``: written by us — ``depth`` (H, W) float32 range image
      (invalid pixels hold +inf) and ``hit`` (H, W) bool mask,
    - ``{output_npz}``: the denoiser must write ``depth`` (H, W) float32 —
      denoised ranges for hit pixels (misses are ignored).

    ``scripts/stub_denoiser.py`` documents the contract end to end; point
    the template at DDD's inference wrapper to reproduce the reference
    study with real weights.
    """
    import shlex
    import subprocess

    os.makedirs(workdir, exist_ok=True)
    in_npz = os.path.join(workdir, "range_%04d_in.npz" % scan_id)
    out_npz = os.path.join(workdir, "range_%04d_out.npz" % scan_id)
    np.savez(in_npz, depth=np.asarray(img, np.float32),
             hit=np.asarray(hit, bool))
    cmd = command.format(input_npz=in_npz, output_npz=out_npz)
    subprocess.run(shlex.split(cmd), check=True)
    if not os.path.exists(out_npz):
        raise RuntimeError("external denoiser wrote no output: %s" % out_npz)
    with np.load(out_npz) as z:
        den = np.asarray(z["depth"], np.float32)
    if den.shape != np.asarray(img).shape:
        raise RuntimeError(
            "denoiser output shape %s != input %s"
            % (den.shape, np.asarray(img).shape)
        )
    import jax.numpy as jnp

    return jnp.where(jnp.asarray(hit), jnp.asarray(den), jnp.asarray(img))


def scan_variants(scan, cfg, model, denoiser_command=None, workdir=".",
                  scan_id: int = 0):
    """(raw, denoised, model-corrected) structured scans. The denoised
    variant uses the external command when given, else the in-framework
    median stand-in."""
    import jax.numpy as jnp
    from numpy.lib.recfunctions import (
        structured_to_unstructured as s2u,
        unstructured_to_structured as u2s,
    )

    from depth_correction_tpu.ops.range_image import (
        project_range_image,
        unproject_range_image,
    )

    pts = s2u(scan[["x", "y", "z"]], dtype=np.float64)
    valid = np.ones(len(pts), bool)
    img, hit = project_range_image(jnp.asarray(pts, jnp.float32), jnp.asarray(valid))
    if denoiser_command:
        den = external_denoise_range_image(
            img, hit, denoiser_command, workdir, scan_id
        )
    else:
        den = median_denoise_range_image(img, hit)
    pts_den, ok = unproject_range_image(den, hit)
    den_scan = u2s(np.asarray(pts_den)[np.asarray(ok)].astype(np.float64),
                   names=["x", "y", "z"])
    return scan, den_scan


def consistency_loss(seqs, cfg, model=None):
    from depth_correction_tpu.train import make_loss_fn, prepare_sequences

    data = prepare_sequences(seqs, cfg)
    loss_fn = make_loss_fn(cfg)
    return float(loss_fn({"model": model}, data))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="open_box/n_4_size_12_12_4_height_1_density_60")
    p.add_argument("--out", default="gen/depth_denoising")
    p.add_argument("--model-w", type=float, default=-0.002)
    p.add_argument(
        "--denoiser-command",
        default=None,
        help="external denoiser template with {input_npz} and "
        "{output_npz} (see external_denoise_range_image); replaces the "
        "median stand-in — point it at DeepDepthDenoising's inference "
        "wrapper to reproduce the reference's compare_to_ddd study",
    )
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from depth_correction_tpu.config import Config
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.utils.io import append

    cfg = Config()
    cfg.float_type = "float32"
    cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.5, 25.0, 0.2
    cfg.nn_r, cfg.nn_k = 0.4, 0
    cfg.nn_max_neighbors = 32
    cfg.min_valid_neighbors = 3
    cfg.vp_dispersion_bounds = []
    cfg.eigenvalue_ratio_bounds = []
    cfg.loss = "min_eigval_loss"
    cfg.loss_kwargs = {"sqrt": False, "normalization": False}
    if args.dataset.startswith("open_box"):
        # Synthetic: inject the bias the correction model removes.
        cfg.depth_bias_model_kwargs = {"w": [args.model_w], "exponent": [4.0]}

    ds = create_dataset(args.dataset, cfg)
    model = ScaledPolynomial(
        w=jnp.asarray([args.model_w]), exponent=jnp.asarray([4.0])
    )

    # Build the three scan sets.
    raw, den = [], []
    poses = []
    for i, (scan, pose) in enumerate(ds):
        r_scan, d_scan = scan_variants(
            scan, cfg, model,
            denoiser_command=args.denoiser_command,
            workdir=os.path.join(args.out, "denoiser_io"),
            scan_id=i,
        )
        raw.append((r_scan, pose))
        den.append((d_scan, pose))
        poses.append(pose)

    class _ListDS(list):
        pass

    loss_raw = consistency_loss([_ListDS(raw)], cfg, model=None)
    loss_med = consistency_loss([_ListDS(den)], cfg, model=None)
    loss_corr = consistency_loss([_ListDS(raw)], cfg, model=model)
    kind = "external-denoised" if args.denoiser_command else "median-denoised"
    print(
        "map-consistency loss: raw %.6g, %s %.6g, "
        "corrected %.6g (%s)" % (loss_raw, kind, loss_med, loss_corr,
                                 args.dataset)
    )
    os.makedirs(args.out, exist_ok=True)
    append(
        os.path.join(args.out, "depth_denoising.csv"),
        "%s %.9g %.9g %.9g\n" % (args.dataset, loss_raw, loss_med, loss_corr),
    )
    return loss_raw, loss_med, loss_corr


if __name__ == "__main__":
    main()
