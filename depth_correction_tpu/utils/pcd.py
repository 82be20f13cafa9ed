"""Minimal PCD (Point Cloud Data) file reader.

Replaces the reference's Open3D dependency for reading Ouster scans
(reference: datasets/newer_college.py:29-44). Supports ascii and binary
encodings of the common x/y/z(+extra) layouts.
"""
from __future__ import annotations

import numpy as np

__all__ = ["read_pcd"]

_PCD_TYPES = {
    ("F", 4): np.float32,
    ("F", 8): np.float64,
    ("I", 1): np.int8,
    ("I", 2): np.int16,
    ("I", 4): np.int32,
    ("I", 8): np.int64,
    ("U", 1): np.uint8,
    ("U", 2): np.uint16,
    ("U", 4): np.uint32,
    ("U", 8): np.uint64,
}


def read_pcd(path: str) -> np.ndarray:
    """Read a .pcd file into a structured numpy array (one field per
    channel; COUNT>1 channels expand to ``name_0..name_{c-1}``)."""
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            if not line or line.startswith("#"):
                continue
            key, _, value = line.partition(" ")
            header[key.upper()] = value.split()
            if key.upper() == "DATA":
                break

        fields = header["FIELDS"]
        sizes = [int(s) for s in header["SIZE"]]
        types = header["TYPE"]
        counts = [int(c) for c in header.get("COUNT", ["1"] * len(fields))]
        n = int(header["POINTS"][0])
        encoding = header["DATA"][0].lower()

        dtype_fields = []
        for name, size, typ, count in zip(fields, sizes, types, counts):
            base = _PCD_TYPES[(typ, size)]
            if count == 1:
                dtype_fields.append((name, base))
            else:
                for c in range(count):
                    dtype_fields.append(("%s_%d" % (name, c), base))
        dtype = np.dtype(dtype_fields)

        if encoding == "ascii":
            body = np.loadtxt(f, dtype=np.float64, max_rows=n)
            body = np.atleast_2d(body)
            out = np.zeros(n, dtype=dtype)
            for i, (name, _) in enumerate(dtype_fields):
                out[name] = body[:, i]
            return out
        if encoding == "binary":
            return np.frombuffer(f.read(n * dtype.itemsize), dtype=dtype, count=n)
        if encoding == "binary_compressed":
            import lzf  # pragma: no cover - optional

            raise NotImplementedError("binary_compressed PCD not supported")
        raise ValueError("Unknown PCD encoding: %s" % encoding)
