"""PCD v0.7 point-cloud file reader: ascii / binary / binary_compressed (LZF).

Clean-room replacement for the reference's vendored third_party/pypcd.py reader
(only the read path is needed by the framework — SouthBay .pcd loading at
datasets/southbay/southbay_raw.py:187-200).  binary_compressed payloads are
decoded with the native C++ LZF decoder (egonn_tpu/native/lzf.cpp).

PCD stores binary_compressed data FIELD-MAJOR: all x values, then all y values,
etc., each field array individually contiguous after decompression.
"""
from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np

from egonn_tpu.utils.native import lzf_decompress

_PCD_TYPE_TO_NUMPY: Dict[Tuple[str, int], np.dtype] = {
    ("F", 4): np.dtype("float32"),
    ("F", 8): np.dtype("float64"),
    ("U", 1): np.dtype("uint8"),
    ("U", 2): np.dtype("uint16"),
    ("U", 4): np.dtype("uint32"),
    ("U", 8): np.dtype("uint64"),
    ("I", 1): np.dtype("int8"),
    ("I", 2): np.dtype("int16"),
    ("I", 4): np.dtype("int32"),
    ("I", 8): np.dtype("int64"),
}


def parse_header(lines: List[str]) -> Dict:
    metadata: Dict = {}
    for ln in lines:
        if ln.startswith("#") or len(ln) < 2:
            continue
        match = re.match(r"(\w+)\s+([\w\s\.\-]+)", ln)
        if not match:
            continue
        key, value = match.group(1).lower(), match.group(2)
        if key in ("fields", "type"):
            metadata[key] = value.split()
        elif key in ("size", "count"):
            metadata[key] = [int(v) for v in value.split()]
        elif key in ("width", "height", "points"):
            metadata[key] = int(value)
        elif key == "data":
            metadata[key] = value.strip().lower()
        else:
            metadata[key] = value.strip()
    metadata.setdefault("count", [1] * len(metadata.get("fields", [])))
    metadata.setdefault("points", metadata.get("width", 0) * metadata.get("height", 1))
    return metadata


def _build_dtype(metadata: Dict) -> np.dtype:
    fields, formats = [], []
    for name, c, t, s in zip(
        metadata["fields"], metadata["count"], metadata["type"], metadata["size"]
    ):
        np_type = _PCD_TYPE_TO_NUMPY[(t, s)]
        if c == 1:
            fields.append(name)
            formats.append(np_type)
        else:
            for i in range(c):
                fields.append(f"{name}_{i:04d}")
                formats.append(np_type)
    # uniquify padding fields named '_'
    seen: Dict[str, int] = {}
    uniq = []
    for f in fields:
        if f in seen:
            seen[f] += 1
            uniq.append(f"{f}_{seen[f]}")
        else:
            seen[f] = 0
            uniq.append(f)
    return np.dtype({"names": uniq, "formats": formats})


def read_pcd(file_pathname: str) -> Tuple[np.ndarray, Dict]:
    """Read a .pcd file; returns (structured array of points, metadata)."""
    with open(file_pathname, "rb") as f:
        header_lines: List[str] = []
        while True:
            ln = f.readline().decode("ascii", errors="ignore").strip()
            header_lines.append(ln)
            if ln.lower().startswith("data"):
                break
        metadata = parse_header(header_lines)
        dtype = _build_dtype(metadata)
        n = metadata["points"]
        data_kind = metadata["data"]
        if data_kind == "ascii":
            body = f.read().decode("ascii", errors="ignore")
            arr = np.loadtxt(body.splitlines(), dtype=dtype, ndmin=1)
        elif data_kind == "binary":
            arr = np.frombuffer(f.read(n * dtype.itemsize), dtype=dtype, count=n)
        elif data_kind == "binary_compressed":
            comp_size, uncomp_size = np.frombuffer(f.read(8), dtype=np.uint32)
            raw = lzf_decompress(f.read(int(comp_size)), int(uncomp_size))
            # field-major layout: each field's column stored contiguously
            arr = np.empty(n, dtype=dtype)
            offset = 0
            for name in dtype.names:
                ft = dtype.fields[name][0]
                nbytes = ft.itemsize * n
                arr[name] = np.frombuffer(raw[offset : offset + nbytes], dtype=ft, count=n)
                offset += nbytes
        else:
            raise NotImplementedError(f"Unsupported PCD data kind: {data_kind}")
    return arr, metadata


def read_pcd_xyz(file_pathname: str) -> np.ndarray:
    """(N, 3) float xyz from a PCD file (the SouthBay access pattern)."""
    arr, _ = read_pcd(file_pathname)
    return np.stack([arr["x"], arr["y"], arr["z"]], axis=1)


def write_pcd_binary(file_pathname: str, xyz: np.ndarray):
    """Write a minimal binary PCD (xyz float32) — for tests and tooling."""
    xyz = np.ascontiguousarray(xyz, dtype=np.float32)
    n = len(xyz)
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n"
        "FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\nDATA binary\n"
    )
    dtype = np.dtype({"names": ["x", "y", "z"], "formats": [np.float32] * 3})
    rec = np.empty(n, dtype=dtype)
    rec["x"], rec["y"], rec["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    with open(file_pathname, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())


def write_pcd_binary_compressed(file_pathname: str, xyz: np.ndarray):
    """Write a binary_compressed PCD (xyz float32, field-major, LZF literal runs)
    — exercises the same read path as Apollo-SouthBay files."""
    from egonn_tpu.utils.native import lzf_compress_py

    xyz = np.ascontiguousarray(xyz, dtype=np.float32)
    n = len(xyz)
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n"
        "FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\n"
        "DATA binary_compressed\n"
    )
    raw = b"".join(np.ascontiguousarray(xyz[:, i]).tobytes() for i in range(3))
    comp = lzf_compress_py(raw)
    with open(file_pathname, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(np.array([len(comp), len(raw)], dtype=np.uint32).tobytes())
        f.write(comp)
