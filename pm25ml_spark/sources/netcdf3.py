"""Minimal NetCDF-3 ("classic", CDF-2/64-bit-offset) codec, numpy only.

Implements the public Unidata classic file format specification — enough
of it to (a) write CF-annotated result cubes (`results.write_raster`,
SURVEY S17) and (b) *really* decode granule files in the distributed
raster reader (`raster.decode_granule`, SURVEY S12) without any NetCDF
library in the container. Files written here are readable by ncdump /
netCDF4 / xarray; files from those tools parse here as long as they are
classic-format (NetCDF-4/HDF5 granules decode through the sibling
`hdf5_min` codec).

Scope intentionally small: fixed dimensions only (no record dimension /
UNLIMITED), the six classic types, global + per-variable attributes.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC2 = b"CDF\x02"  # 64-bit offset variant
_MAGIC1 = b"CDF\x01"
_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

# nc_type -> (numpy dtype, size)
_TYPES = {
    1: (np.dtype(">i1"), 1),  # NC_BYTE
    2: (np.dtype("S1"), 1),  # NC_CHAR
    3: (np.dtype(">i2"), 2),  # NC_SHORT
    4: (np.dtype(">i4"), 4),  # NC_INT
    5: (np.dtype(">f4"), 4),  # NC_FLOAT
    6: (np.dtype(">f8"), 8),  # NC_DOUBLE
}
_KIND_TO_NCTYPE = {
    ("i", 1): 1,
    ("S", 1): 2,
    ("i", 2): 3,
    ("i", 4): 4,
    ("f", 4): 5,
    ("f", 8): 6,
}


def _nc_type_of(arr: np.ndarray) -> int:
    key = (arr.dtype.kind, arr.dtype.itemsize)
    if key == ("i", 8):  # classic format has no 64-bit int: narrow or fail
        if np.abs(arr).max(initial=0) < 2**31:
            return 4
        raise ValueError("int64 values exceed NC_INT range (classic format)")
    if key == ("f", 8):
        return 6
    if key not in _KIND_TO_NCTYPE:
        raise ValueError(f"unsupported dtype {arr.dtype} for NetCDF-3")
    return _KIND_TO_NCTYPE[key]


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _pack_name(name: str) -> bytes:
    raw = name.encode()
    return struct.pack(">i", len(raw)) + _pad4(raw)


def _pack_attr_value(value) -> tuple[int, int, bytes]:
    """-> (nc_type, nelems, padded payload bytes)."""
    if isinstance(value, str):
        raw = value.encode()
        return 2, len(raw), _pad4(raw)
    arr = np.atleast_1d(np.asarray(value))
    # int64 attrs narrow through the same range check as variable data —
    # a silent int32 wraparound would corrupt metadata without an error
    nct = _nc_type_of(arr)
    payload = arr.astype(_TYPES[nct][0]).tobytes()
    return nct, arr.size, _pad4(payload)


def _pack_att_list(attrs: dict) -> bytes:
    if not attrs:
        return struct.pack(">ii", 0, 0)  # ABSENT
    out = [struct.pack(">ii", _NC_ATTRIBUTE, len(attrs))]
    for name, value in attrs.items():
        nct, nelems, payload = _pack_attr_value(value)
        out.append(_pack_name(name) + struct.pack(">ii", nct, nelems) + payload)
    return b"".join(out)


def write_netcdf3(
    path: str,
    dims: dict[str, int],
    variables: dict[str, tuple[tuple[str, ...], np.ndarray, dict]],
    global_attrs: dict | None = None,
) -> str:
    """Write a classic (CDF-2) NetCDF file.

    ``variables`` maps name -> (dim names, array, attrs). Arrays must match
    the declared dim sizes exactly; dtypes are coerced to the closest
    classic type (int64 narrows to NC_INT when it fits).
    """
    dim_ids = {name: i for i, name in enumerate(dims)}
    var_items = []
    for name, (vdims, arr, attrs) in variables.items():
        arr = np.asarray(arr)
        expect = tuple(dims[d] for d in vdims)
        if arr.shape != expect:
            raise ValueError(
                f"variable {name}: shape {arr.shape} != dims {vdims} {expect}"
            )
        nct = _nc_type_of(arr)
        data = _pad4(arr.astype(_TYPES[nct][0]).tobytes())
        var_items.append((name, tuple(dim_ids[d] for d in vdims), attrs, nct, data))

    def header(begins: list[int]) -> bytes:
        out = [_MAGIC2, struct.pack(">i", 0)]  # numrecs=0: no record vars
        if dims:
            out.append(struct.pack(">ii", _NC_DIMENSION, len(dims)))
            for name, size in dims.items():
                out.append(_pack_name(name) + struct.pack(">i", size))
        else:
            out.append(struct.pack(">ii", 0, 0))
        out.append(_pack_att_list(global_attrs or {}))
        if var_items:
            out.append(struct.pack(">ii", _NC_VARIABLE, len(var_items)))
            for (name, dids, attrs, nct, data), begin in zip(var_items, begins):
                out.append(_pack_name(name))
                out.append(struct.pack(">i", len(dids)))
                out.append(struct.pack(f">{len(dids)}i", *dids))
                out.append(_pack_att_list(attrs))
                out.append(struct.pack(">ii", nct, len(data)))
                out.append(struct.pack(">q", begin))  # CDF-2: 64-bit offset
        else:
            out.append(struct.pack(">ii", 0, 0))
        return b"".join(out)

    # begins depend on header size, which is begin-value independent
    hlen = len(header([0] * len(var_items)))
    begins, off = [], hlen
    for item in var_items:
        begins.append(off)
        off += len(item[4])
    with open(path, "wb") as fh:
        fh.write(header(begins))
        for item in var_items:
            fh.write(item[4])
    return path


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("truncated NetCDF-3 file")
        self.pos += n
        return b

    def i4(self) -> int:
        return struct.unpack(">i", self.take(4))[0]

    def i8(self) -> int:
        return struct.unpack(">q", self.take(8))[0]

    def name(self) -> str:
        n = self.i4()
        raw = self.take(n + (-n % 4))
        return raw[:n].decode()

    def attrs(self) -> dict:
        tag = self.i4()
        count = self.i4()
        if tag == 0:
            return {}
        if tag != _NC_ATTRIBUTE:
            raise ValueError(f"bad attribute tag {tag}")
        out = {}
        for _ in range(count):
            nm = self.name()
            nct, nelems = self.i4(), self.i4()
            dtype, size = _TYPES[nct]
            raw = self.take(nelems * size + (-(nelems * size) % 4))
            if nct == 2:
                out[nm] = raw[: nelems].decode(errors="replace")
            else:
                vals = np.frombuffer(raw[: nelems * size], dtype=dtype)
                out[nm] = vals[0] if nelems == 1 else vals
        return out


def read_netcdf3(path: str):
    """Parse a classic NetCDF file -> (dims, variables, global_attrs) with
    ``variables`` mapping name -> (dim names, array, attrs). Fixed-size
    variables only (files we write; most analysis granules).

    Raises ``ValueError`` on any malformed input — internal faults are
    converted at this boundary (one except quarantines a bad file)."""
    try:
        return _read_netcdf3(path)
    except ValueError:
        raise
    except (IndexError, KeyError, struct.error, OverflowError) as exc:
        raise ValueError(
            f"corrupt NetCDF-3 file: {type(exc).__name__}: {exc}"
        ) from exc


def _read_netcdf3(path: str):
    with open(path, "rb") as fh:
        buf = fh.read()
    magic = buf[:4]
    if magic not in (_MAGIC1, _MAGIC2):
        raise ValueError(f"not a classic NetCDF-3 file: magic {magic!r}")
    wide = magic == _MAGIC2
    r = _Reader(buf)
    r.pos = 4
    numrecs = r.i4()
    if numrecs not in (0,):  # record vars unsupported (see module scope)
        raise ValueError("record (UNLIMITED) dimension not supported")
    tag, count = r.i4(), r.i4()
    dim_names: list[str] = []
    dims: dict[str, int] = {}
    if tag == _NC_DIMENSION:
        for _ in range(count):
            nm = r.name()
            dims[nm] = r.i4()
            dim_names.append(nm)
    elif tag != 0:
        raise ValueError(f"bad dimension tag {tag}")
    gatts = r.attrs()
    tag, count = r.i4(), r.i4()
    variables: dict[str, tuple[tuple[str, ...], np.ndarray, dict]] = {}
    if tag == _NC_VARIABLE:
        for _ in range(count):
            nm = r.name()
            ndims = r.i4()
            dids = [r.i4() for _ in range(ndims)]
            vatts = r.attrs()
            nct = r.i4()
            r.i4()  # vsize (ignored; recomputed from shape)
            begin = r.i8() if wide else r.i4()
            dtype, size = _TYPES[nct]
            shape = tuple(dims[dim_names[d]] for d in dids)
            n = int(np.prod(shape)) if shape else 1
            arr = np.frombuffer(
                buf[begin : begin + n * size], dtype=dtype
            ).reshape(shape)
            vdims = tuple(dim_names[d] for d in dids)
            variables[nm] = (vdims, arr, vatts)
    elif tag != 0:
        raise ValueError(f"bad variable tag {tag}")
    return dims, variables, gatts
