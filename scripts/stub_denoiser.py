"""Stub external denoiser — documents the depth_denoising command contract.

Reads ``--input`` (npz: ``depth`` (H, W) float32 with +inf misses, ``hit``
(H, W) bool), writes ``--output`` (npz: ``depth`` (H, W) float32). This
stand-in shrinks every hit range by a fixed fraction (a recognizable,
testable transform); a real external net (e.g. DeepDepthDenoising,
reference scripts/compare_to_ddd:1-165) plugs in with the same flags::

    python scripts/depth_denoising.py --denoiser-command \\
        "python scripts/stub_denoiser.py --input {input_npz} --output {output_npz}"
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--scale", type=float, default=0.999)
    args = p.parse_args(argv)
    with np.load(args.input) as z:
        depth = np.asarray(z["depth"], np.float32)
        hit = np.asarray(z["hit"], bool)
    den = np.where(hit, depth * np.float32(args.scale), depth)
    np.savez(args.output, depth=den.astype(np.float32))


if __name__ == "__main__":
    main()
