"""Zarr v2 store: numpy-only codec + a Spark-PARALLEL chunk sink.

The reference exports its terminal raster as NetCDF
(netcdf_final_result_writer.py); modern raster consumers increasingly
want the same cube as a Zarr store — chunked, cloud-object-friendly, and
writable IN PARALLEL because every chunk is an independent object. That
last property is the Spark-native story: the NetCDF sink is necessarily
a driver-side serial write (one file, one header), while
:func:`write_zarr_distributed` lets EVERY EXECUTOR TASK write its own
chunk file with no coordination beyond the driver-side metadata stamp —
at a 1000-executor scale the sink is as parallel as the computation.

Format notes (Zarr spec v2, https://zarr-specs.readthedocs.io/):

- directory store; group marker ``.zgroup`` = ``{"zarr_format": 2}``;
- each array is a sub-directory with ``.zarray`` metadata (shape,
  chunks, dtype like ``"<f4"``, compressor ``{"id":"zlib","level":n}``
  or null, ``fill_value`` (the JSON string ``"NaN"`` for float NaN),
  C order, no filters) and optional ``.zattrs``;
- chunk files are named by dot-joined chunk indices (``"0.1.2"``) and
  hold the raw C-order bytes of a FULL-SIZE chunk (edge chunks padded
  with the fill value), zlib-compressed when a compressor is declared;
- the ``_ARRAY_DIMENSIONS`` attribute on each array (the xarray
  convention) names its dimensions, so the store opens as a dataset in
  any xarray-compatible reader.

Only ``zlib`` (and uncompressed) codecs are implemented — stdlib-only,
like the repo's NetCDF/HDF5 codecs.
"""

from __future__ import annotations

import json
import math
import os
import zlib

import numpy as np

_ZARR_FORMAT = 2


def _dtype_str(dtype: np.dtype) -> str:
    dt = np.dtype(dtype)
    if dt.byteorder == "=":
        return ("<" if np.little_endian else ">") + dt.str[1:]
    return dt.str


def _fill_json(fill_value, dtype: np.dtype):
    if np.issubdtype(np.dtype(dtype), np.floating) and (
        fill_value is not None and math.isnan(float(fill_value))
    ):
        return "NaN"
    return fill_value


def _fill_from_json(v, dtype: np.dtype):
    if v == "NaN":
        return np.nan
    return v


def chunk_grid(shape: tuple[int, ...], chunks: tuple[int, ...]):
    """Iterate (chunk_index_tuple, slice_tuple) over the chunk grid."""
    counts = [-(-s // c) for s, c in zip(shape, chunks)]
    idx = [0] * len(shape)
    total = int(np.prod(counts)) if counts else 1
    for _ in range(total):
        slices = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunks, shape)
        )
        yield tuple(idx), slices
        for d in range(len(idx) - 1, -1, -1):
            idx[d] += 1
            if idx[d] < counts[d]:
                break
            idx[d] = 0


def encode_chunk(
    block: np.ndarray,
    chunks: tuple[int, ...],
    dtype: np.dtype,
    fill_value,
    level: int | None = 5,
) -> bytes:
    """Full-size C-order chunk bytes (edge blocks padded with fill),
    zlib-compressed when ``level`` is not None. Shared by the driver
    and the distributed writer so their chunk files are bit-identical."""
    full = np.full(chunks, fill_value, dtype=dtype)
    full[tuple(slice(0, s) for s in block.shape)] = block
    raw = np.ascontiguousarray(full, dtype=dtype).tobytes()
    return zlib.compress(raw, level) if level is not None else raw


def _write_array_meta(
    path: str,
    shape: tuple[int, ...],
    chunks: tuple[int, ...],
    dtype: np.dtype,
    dims: list[str],
    attrs: dict | None,
    level: int | None,
    fill_value,
) -> None:
    """.zarray + .zattrs for one array dir — the ONE spelling of the
    metadata schema, shared by the driver and distributed writers."""
    os.makedirs(path, exist_ok=True)
    meta = {
        "zarr_format": _ZARR_FORMAT,
        "shape": list(shape),
        "chunks": list(chunks),
        "dtype": _dtype_str(np.dtype(dtype)),
        "compressor": {"id": "zlib", "level": level}
        if level is not None
        else None,
        "fill_value": _fill_json(fill_value, np.dtype(dtype)),
        "order": "C",
        "filters": None,
    }
    with open(os.path.join(path, ".zarray"), "w") as f:
        json.dump(meta, f, indent=1)
    zattrs = {"_ARRAY_DIMENSIONS": dims, **(attrs or {})}
    with open(os.path.join(path, ".zattrs"), "w") as f:
        json.dump(zattrs, f, indent=1)


def _clear_chunk_files(path: str) -> None:
    """Remove existing chunk objects (dot-separated integer names) so a
    re-run can never leave STALE chunks behind — the reader treats any
    present chunk as data, so leftovers from a previous write would
    silently mix two runs."""
    if not os.path.isdir(path):
        return
    for name in os.listdir(path):
        if all(part.isdigit() for part in name.split(".")):
            os.remove(os.path.join(path, name))


def write_zarr_array(
    path: str,
    arr: np.ndarray,
    chunks: tuple[int, ...],
    dims: list[str],
    attrs: dict | None = None,
    level: int | None = 5,
    fill_value=np.nan,
) -> None:
    """Driver-side Zarr v2 array write (metadata + every chunk)."""
    dt = np.dtype(arr.dtype)
    _write_array_meta(
        path, arr.shape, chunks, dt, dims, attrs, level, fill_value
    )
    _clear_chunk_files(path)
    for idx, slc in chunk_grid(arr.shape, chunks):
        data = encode_chunk(arr[slc], chunks, dt, fill_value, level)
        with open(os.path.join(path, ".".join(map(str, idx))), "wb") as f:
            f.write(data)


def read_zarr_array(path: str) -> tuple[np.ndarray, dict]:
    """Read a Zarr v2 array directory back to (ndarray, attrs)."""
    with open(os.path.join(path, ".zarray")) as f:
        meta = json.load(f)
    if meta.get("zarr_format") != _ZARR_FORMAT:
        raise ValueError(f"unsupported zarr_format {meta.get('zarr_format')}")
    if meta.get("filters"):
        raise ValueError("zarr filters not supported")
    comp = meta.get("compressor")
    if comp is not None and comp.get("id") != "zlib":
        raise ValueError(f"unsupported compressor {comp}")
    if meta.get("order") != "C":
        raise ValueError("only C order supported")
    dt = np.dtype(meta["dtype"])
    shape = tuple(meta["shape"])
    chunks = tuple(meta["chunks"])
    fill = _fill_from_json(meta.get("fill_value"), dt)
    arr = np.full(shape, fill, dtype=dt)
    for idx, slc in chunk_grid(shape, chunks):
        cpath = os.path.join(path, ".".join(map(str, idx)))
        if not os.path.exists(cpath):
            continue  # absent chunk = all fill (spec-allowed)
        with open(cpath, "rb") as f:
            raw = f.read()
        if comp is not None:
            raw = zlib.decompress(raw)
        block = np.frombuffer(raw, dtype=dt).reshape(chunks)
        arr[slc] = block[tuple(slice(0, s.stop - s.start) for s in slc)]
    attrs = {}
    apath = os.path.join(path, ".zattrs")
    if os.path.exists(apath):
        with open(apath) as f:
            attrs = json.load(f)
    return arr, attrs


def write_zarr_cube(
    path: str,
    cube: np.ndarray,
    dates: np.ndarray,
    ys: np.ndarray,
    xs: np.ndarray,
    var_name: str = "pm25",
    chunks: tuple[int, int, int] | None = None,
    attrs: dict | None = None,
    level: int | None = 5,
) -> None:
    """(time, y, x) cube + coordinates → an xarray-layout Zarr group
    (driver-side; the terminal raster is driver-sized by contract)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": _ZARR_FORMAT}, f)
    if chunks is None:
        chunks = (1, cube.shape[1], cube.shape[2])
    write_zarr_array(
        os.path.join(path, var_name),
        np.asarray(cube, dtype=np.float32),
        chunks,
        ["time", "y", "x"],
        attrs=attrs,
        level=level,
    )
    _write_coord_arrays(path, dates, ys, xs)
    consolidate_metadata(path)


def _write_coord_arrays(path: str, dates, ys, xs) -> None:
    """The time/y/x coordinate arrays of an xarray-layout cube group —
    shared by the driver and distributed cube writers."""
    from pm25ml_spark.sources.results import _TIME_EPOCH

    t = (
        (np.asarray(dates, dtype="datetime64[D]") - _TIME_EPOCH)
        .astype("timedelta64[D]")
        .astype(np.int32)
    )
    for name, vals, unit in (
        ("time", t, "days since 2000-01-01"),
        ("y", np.asarray(ys, dtype=np.float64), "m"),
        ("x", np.asarray(xs, dtype=np.float64), "m"),
    ):
        write_zarr_array(
            os.path.join(path, name),
            vals,
            (len(vals),),
            [name],
            attrs={"units": unit},
            level=None,
            fill_value=0,
        )


def consolidate_metadata(path: str) -> dict:
    """Write the Zarr v2 CONSOLIDATED metadata key ``.zmetadata`` at the
    group root: every ``.zgroup`` / ``.zarray`` / ``.zattrs`` document in
    the store, inlined under one JSON object (spec:
    ``zarr_consolidated_format: 1``; the layout xarray's
    ``open_zarr(consolidated=True)`` expects).

    Why it matters at scale: on an object store, discovering a group's
    arrays otherwise costs one LIST plus one GET per metadata key —
    consolidation makes opening the store exactly ONE read regardless of
    how many arrays/attributes it holds. Returns the document written.
    """
    metadata: dict[str, dict] = {}
    for dirpath, dirnames, filenames in os.walk(path):
        # Dot-prefixed dirs are swap debris (.old-<hex> left by a crash
        # between write_zarr_distributed's two go-live renames, .stage-*
        # from an aborted write) — inlining their metadata would
        # advertise phantom arrays to consolidated readers.
        dirnames[:] = [d for d in dirnames if not d.startswith(".")]
        rel = os.path.relpath(dirpath, path)
        for name in filenames:
            if name not in (".zgroup", ".zarray", ".zattrs"):
                continue
            key = name if rel == "." else f"{rel}/{name}"
            with open(os.path.join(dirpath, name)) as f:
                metadata[key.replace(os.sep, "/")] = json.load(f)
    doc = {"metadata": metadata, "zarr_consolidated_format": 1}
    with open(os.path.join(path, ".zmetadata"), "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    return doc


def read_zarr_cube(path: str, var_name: str = "pm25") -> dict:
    """Open an xarray-layout Zarr group written by this module."""
    cube, attrs = read_zarr_array(os.path.join(path, var_name))
    out = {"values": cube, "attrs": attrs}
    for name in ("time", "y", "x"):
        apath = os.path.join(path, name)
        if os.path.isdir(apath):
            out[name], _ = read_zarr_array(apath)
    return out


def write_zarr_distributed(
    df,
    path: str,
    dates: np.ndarray,
    ys: np.ndarray,
    xs: np.ndarray,
    value_col: str,
    date_col: str = "date",
    y_col: str = "original_y",
    x_col: str = "original_x",
    var_name: str = "pm25",
    chunks: tuple[int, int, int] = (1, 64, 64),
    attrs: dict | None = None,
    level: int | None = 5,
) -> int:
    """THE parallel sink: every Spark task writes its own chunk file.

    The long-form frame (date, y, x, value) is mapped to global cube
    indices against the driver-known (small) coordinate axes, assigned
    its chunk id, and grouped by chunk — ``applyInPandas`` then builds
    each full-size chunk (fill-padded) and writes the chunk object
    directly. No pivot on the driver, no single writer: chunk writes
    scale with the cluster exactly like the computation that produced
    them, which is the reason Zarr exists as a cloud-raster format.
    Chunk bytes are produced by the same :func:`encode_chunk` as the
    driver writer, so the two sinks are bit-identical file-for-file.

    Failure safety: chunks are staged into a temp directory and only
    swapped into place (old chunks removed, metadata stamped) after the
    ONE chunk job validates — rows whose coordinates match no axis value
    ride through the same job under a sentinel group, so a
    dtype/precision mismatch raises BEFORE anything touches the existing
    store, with no second pass over the input. Returns the number of
    chunk files written.

    ``path`` must be a filesystem visible to every executor (local dir
    on local[*], NFS/object-store mount on a cluster).
    """
    import shutil
    import uuid as _uuid

    import pandas as pd
    from pyspark.sql import functions as F

    dt = np.dtype(np.float32)
    shape = (len(dates), len(ys), len(xs))
    date_keys = {str(np.datetime64(d, "D")): i for i, d in enumerate(dates)}
    y_keys = {float(v): i for i, v in enumerate(ys)}
    x_keys = {float(v): i for i, v in enumerate(xs)}
    ct, cy, cx = chunks
    var_dir = os.path.join(path, var_name)
    stage_dir = os.path.join(path, f".stage-{_uuid.uuid4().hex}")
    os.makedirs(stage_dir, exist_ok=True)
    fill = np.nan

    def write_chunk(key, pdf):
        tc, yc, xc = (int(key[0]), int(key[1]), int(key[2]))
        if tc < 0:  # sentinel: unmatched-coordinate rows, counted only
            return pd.DataFrame(
                {"chunk": ["__unmatched__"], "n_cells": [len(pdf)]}
            )
        block = np.full((ct, cy, cx), fill, dtype=dt)
        ti = pdf["__t"].to_numpy() - tc * ct
        yi = pdf["__y"].to_numpy() - yc * cy
        xi = pdf["__x"].to_numpy() - xc * cx
        # duplicate (date, y, x) rows would let the LAST row win — a
        # shuffle-order-dependent, nondeterministic chunk — so they ride
        # back as a sentinel (same pattern as unmatched rows) and the
        # driver raises before anything touches the existing store
        n_dup = len(pdf) - len({(t, y, x) for t, y, x in zip(ti, yi, xi)})
        if n_dup:
            return pd.DataFrame(
                {"chunk": ["__duplicate__"], "n_cells": [n_dup]}
            )
        block[ti, yi, xi] = pdf[value_col].to_numpy(dtype=dt)
        # block is already full-size; encode_chunk pads no further
        data = encode_chunk(block, (ct, cy, cx), dt, fill, level)
        fname = f"{tc}.{yc}.{xc}"
        with open(os.path.join(stage_dir, fname), "wb") as f:
            f.write(data)
        return pd.DataFrame({"chunk": [fname], "n_cells": [len(pdf)]})

    t_map = F.create_map(
        *[x for k, v in date_keys.items() for x in (F.lit(k), F.lit(v))]
    )
    y_map = F.create_map(
        *[x for k, v in y_keys.items() for x in (F.lit(k), F.lit(v))]
    )
    x_map = F.create_map(
        *[x for k, v in x_keys.items() for x in (F.lit(k), F.lit(v))]
    )
    indexed = df.select(
        t_map[F.date_format(F.col(date_col), "yyyy-MM-dd")].alias("__t"),
        y_map[F.col(y_col).cast("double")].alias("__y"),
        x_map[F.col(x_col).cast("double")].alias("__x"),
        F.col(value_col),
    )
    matched = (
        F.col("__t").isNotNull()
        & F.col("__y").isNotNull()
        & F.col("__x").isNotNull()
    )
    try:
        written = (
            indexed.withColumn(
                "__ct",
                F.when(matched, (F.col("__t") / ct).cast("int")).otherwise(-1),
            )
            .withColumn(
                "__cy",
                F.when(matched, (F.col("__y") / cy).cast("int")).otherwise(-1),
            )
            .withColumn(
                "__cx",
                F.when(matched, (F.col("__x") / cx).cast("int")).otherwise(-1),
            )
            .groupBy("__ct", "__cy", "__cx")
            .applyInPandas(write_chunk, "chunk string, n_cells long")
            .collect()
        )
        n_unmatched = sum(
            r.n_cells for r in written if r.chunk == "__unmatched__"
        )
        if n_unmatched:
            raise ValueError(
                f"write_zarr_distributed: {n_unmatched} rows matched no "
                "coordinate axis value (dtype/precision mismatch between "
                "frame columns and the dates/ys/xs axes?) — the existing "
                "store is untouched"
            )
        n_dup = sum(r.n_cells for r in written if r.chunk == "__duplicate__")
        if n_dup:
            raise ValueError(
                f"write_zarr_distributed: {n_dup} duplicate (date, y, x) "
                "rows — last-row-wins would make chunk bytes depend on "
                "shuffle order; dedup the frame first. The existing store "
                "is untouched"
            )
        # the FULL array dir (chunks + .zarray + .zattrs) is staged, so
        # the go-live step below is two directory renames, never a
        # file-by-file swap that a crash could tear into old-metadata/
        # new-chunks mixtures
        _write_array_meta(
            stage_dir,
            shape,
            (ct, cy, cx),
            dt,
            ["time", "y", "x"],
            attrs,
            level,
            np.nan,
        )
    except BaseException:
        shutil.rmtree(stage_dir, ignore_errors=True)
        raise

    # validated: retire the old array dir in ONE rename, promote the
    # staged dir in ONE rename. A crash between the two leaves the array
    # ABSENT (fail-stop for readers, old data recoverable from .old-*) —
    # never a partial mixture of two runs' chunks under live metadata.
    old_dir = os.path.join(path, f".old-{_uuid.uuid4().hex}")
    if os.path.isdir(var_dir):
        os.rename(var_dir, old_dir)
    os.rename(stage_dir, var_dir)
    shutil.rmtree(old_dir, ignore_errors=True)
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": _ZARR_FORMAT}, f)
    _write_coord_arrays(path, dates, ys, xs)
    consolidate_metadata(path)
    return len(
        [
            r
            for r in written
            if r.chunk not in ("__unmatched__", "__duplicate__")
        ]
    )


def read_zarr_cube_distributed(spark, path: str, var_name: str = "pm25"):
    """Chunk-parallel Zarr read: the scan dual of
    :func:`write_zarr_distributed`.

    The driver reads ONLY metadata (one ``.zmetadata`` document — the
    single-GET open that consolidation exists for — falling back to the
    per-array keys) plus the tiny coordinate arrays; the chunk objects
    are decoded on EXECUTORS, one task per chunk file, via an
    Arrow-batched ``mapInPandas`` over the chunk-key list. Fill cells
    (NaN) are dropped on the executor, so only real samples cross the
    shuffle — at 100 TB the read parallelizes exactly like the write.

    Returns a long-form DataFrame ``(t_idx int, y double, x double,
    value double)`` where ``t_idx`` indexes the store's time axis.
    """
    import pandas as pd

    var_dir = os.path.join(path, var_name)
    zmeta = os.path.join(path, ".zmetadata")
    if os.path.exists(zmeta):
        with open(zmeta) as f:
            meta = json.load(f)["metadata"][f"{var_name}/.zarray"]
    else:
        with open(os.path.join(var_dir, ".zarray")) as f:
            meta = json.load(f)
    # same store validation as read_zarr_array — a foreign writer's
    # v3/F-order/filtered store must fail loudly, not decode garbage
    if meta.get("zarr_format") != _ZARR_FORMAT:
        raise ValueError(f"unsupported zarr_format {meta.get('zarr_format')}")
    if meta.get("filters"):
        raise ValueError("zarr filters not supported")
    if meta.get("order") != "C":
        raise ValueError("only C order supported")
    comp = meta.get("compressor")
    if comp is not None and comp.get("id") != "zlib":
        raise ValueError(f"unsupported compressor {comp}")
    dt = np.dtype(meta["dtype"])
    shape = tuple(meta["shape"])
    chunks = tuple(meta["chunks"])
    if len(shape) != 3:
        raise ValueError("read_zarr_cube_distributed expects a 3-d cube")
    # the drop-mask comes from the STORE's declared fill, not an assumed
    # NaN: int-dtype stores have no NaN, and a non-NaN-fill float store
    # would otherwise silently return its fill cells as data
    fill = _fill_from_json(meta.get("fill_value"), dt)
    # coordinate axes: driver-sized by the cube contract, broadcast
    ys, _ = read_zarr_array(os.path.join(path, "y"))
    xs, _ = read_zarr_array(os.path.join(path, "x"))
    keys = [
        ".".join(map(str, idx))
        for idx, _slc in chunk_grid(shape, chunks)
        if os.path.exists(os.path.join(var_dir, ".".join(map(str, idx))))
    ]
    fill_token = (
        "NaN" if (isinstance(fill, float) and np.isnan(fill)) else fill
    )
    bc = spark.sparkContext.broadcast(
        (var_dir, shape, chunks, dt.str, comp is not None,
         ys.tolist(), xs.tolist(), fill_token)
    )

    def decode(batches):
        vdir, shp, cks, dts, zipped, ys_l, xs_l, fill_t = bc.value
        dtv = np.dtype(dts)
        ct, cy, cx = cks
        ya = np.asarray(ys_l, dtype=np.float64)
        xa = np.asarray(xs_l, dtype=np.float64)
        for pdf in batches:
            for key in pdf["key"]:
                tc, yc, xc = (int(p) for p in key.split("."))
                with open(os.path.join(vdir, key), "rb") as f:
                    raw = f.read()
                if zipped:
                    raw = zlib.decompress(raw)
                block = np.frombuffer(raw, dtype=dtv).reshape(cks)
                # trim edge-chunk padding back to the true extent
                bt = min(ct, shp[0] - tc * ct)
                by = min(cy, shp[1] - yc * cy)
                bx = min(cx, shp[2] - xc * cx)
                block = block[:bt, :by, :bx]
                if fill_t == "NaN":
                    keep = ~np.isnan(block)
                elif fill_t is None:
                    # null fill_value: the store declares no fill — every
                    # stored cell is real data
                    keep = np.ones(block.shape, dtype=bool)
                else:
                    keep = block != fill_t
                ti, yi, xi = np.nonzero(keep)
                yield pd.DataFrame(
                    {
                        "t_idx": (ti + tc * ct).astype(np.int32),
                        "y": ya[yi + yc * cy],
                        "x": xa[xi + xc * cx],
                        "value": block[ti, yi, xi].astype(np.float64),
                    }
                )

    kdf = spark.createDataFrame([(k,) for k in keys], "key string")
    nparts = min(len(keys), spark.sparkContext.defaultParallelism) or 1
    return kdf.repartition(nparts).mapInPandas(
        decode, "t_idx int, y double, x double, value double"
    )
