"""Solid: virtual constant-value tiled raster with an LOD overview pyramid.

Re-expression of the reference Solid driver
(/root/reference/gdal-drivers/solid.{hpp,cpp}) as a generator Dataset
source: one row per (lod, band, tile) with a constant pixel block.

- config INI round-trip mirrors writeConfig/Open (solid.cpp:53-88,172-274):
  `[solid]` srs / size "WxH" / tileSize / extents "llx,lly:urx,ury" XOR
  geoTransform "g0, g1, g2, g3, g4, g5", plus repeated `[band]` sections
  (value / dataType / colorInterpretation);
- exactly-one-of extents/geoTransform validation (solid.cpp:234-248);
- dtype dispatch over the 7 GDAL primitive types (solid.cpp:408-440);
- overview sizes by round-halving (solid.cpp:352-369) via grid.overview_sizes.

Generation is distributed: `ray.data.range(n_tiles)` -> map_batches where
each task materializes its tiles; the constant block per (band, dtype) is
built once per batch and reused (the reference builds it once per band,
solid.cpp:158-164 — same economy, sliced per Ray task).
"""

from __future__ import annotations

import io
import re
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data

from ..grid import (Extents, extents_to_gt, gt_to_extents, num_tiles,
                    overview_sizes)

DTYPES = {"Byte": np.uint8, "UInt16": np.uint16, "Int16": np.int16,
          "UInt32": np.uint32, "Int32": np.int32, "Float32": np.float32,
          "Float64": np.float64}


@dataclass
class Band:
    value: float
    data_type: str = "Byte"            # GDAL name, key of DTYPES
    color_interpretation: str = "Gray"

    def __post_init__(self):
        if self.data_type not in DTYPES:
            # solid.cpp:437-439 "Unsupported data type"
            raise ValueError(f"Unsupported data type {self.data_type!r}")


@dataclass
class SolidSpec:
    srs: str
    size: tuple[int, int]                       # (w, h)
    bands: list[Band]
    extents: Optional[Extents] = None
    geo_transform: Optional[tuple[float, ...]] = None
    tile_size: tuple[int, int] = (256, 256)

    def __post_init__(self):
        has_e, has_g = self.extents is not None, self.geo_transform is not None
        if has_e and has_g:
            raise ValueError("both extents and geoTransform are set")
        if not (has_e or has_g):
            raise ValueError("both extents and geoTransform are unset")

    @property
    def gt(self) -> tuple[float, ...]:
        if self.geo_transform is not None:
            return tuple(self.geo_transform)
        return extents_to_gt(self.extents, *self.size)

    @property
    def world(self) -> Extents:
        if self.extents is not None:
            return self.extents
        return gt_to_extents(self.geo_transform, *self.size)

    def overviews(self) -> list[tuple[int, int]]:
        return overview_sizes(*self.size, *self.tile_size)


def write_config(spec: SolidSpec) -> str:
    """Serialize to the reference INI shape (solid.cpp:53-88; scientific
    16-digit floats for the geo fields)."""
    out = io.StringIO()
    out.write("[solid]\n")
    out.write(f"srs = {spec.srs}\n")
    out.write(f"size = {spec.size[0]}x{spec.size[1]}\n")
    out.write(f"tileSize = {spec.tile_size[0]}x{spec.tile_size[1]}\n")
    if spec.extents is not None:
        e = spec.extents
        out.write("extents = {:.16e},{:.16e}:{:.16e},{:.16e}\n".format(
            e.llx, e.lly, e.urx, e.ury))
    else:
        out.write("geoTransform = "
                  + ", ".join(f"{v:.16e}" for v in spec.geo_transform) + "\n")
    for b in spec.bands:
        out.write("\n[band]\n")
        out.write(f"value = {b.value}\n")
        out.write(f"dataType = {b.data_type}\n")
        out.write(f"colorInterpretation = {b.color_interpretation}\n")
    return out.getvalue()


def parse_config(text: str) -> SolidSpec:
    """Parse the INI shape with repeated [band] sections (solid.cpp:172-274).
    Malformed input raises ValueError (the probe-failure path)."""
    solid: dict[str, str] = {}
    bands: list[dict[str, str]] = []
    cur: Optional[dict[str, str]] = None
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith((";", "#")):
            continue
        m = re.fullmatch(r"\[(\w+)\]", line)
        if m:
            name = m.group(1)
            if name == "solid":
                cur = solid
            elif name == "band":
                bands.append({})
                cur = bands[-1]
            else:
                raise ValueError(f"unknown section [{name}]")
            continue
        if cur is None or "=" not in line:
            raise ValueError(f"stray line {line!r}")
        k, v = line.split("=", 1)
        cur[k.strip()] = v.strip()

    def size2(s: str) -> tuple[int, int]:
        w, h = s.split("x")
        return (int(w), int(h))

    if "srs" not in solid or "size" not in solid:
        raise ValueError("missing required solid.srs/solid.size")
    extents = None
    gt = None
    if "extents" in solid:
        ll, ur = solid["extents"].split(":")
        llx, lly = map(float, ll.split(","))
        urx, ury = map(float, ur.split(","))
        extents = Extents(llx, lly, urx, ury)
    if "geoTransform" in solid:
        gt = tuple(float(v) for v in solid["geoTransform"].split(","))
        if len(gt) != 6:
            raise ValueError("geoTransform needs 6 coefficients")
    for b in bands:
        if "value" not in b:
            raise ValueError("band section missing 'value'")
    try:
        return SolidSpec(
            srs=solid["srs"],
            size=size2(solid["size"]),
            tile_size=size2(solid.get("tileSize", "256x256")),
            extents=extents,
            geo_transform=gt,
            bands=[Band(value=float(b["value"]),
                        data_type=b.get("dataType", "Byte"),
                        color_interpretation=b.get("colorInterpretation",
                                                   "Gray"))
                   for b in bands],
        )
    except KeyError as e:
        # the documented probe-failure contract is ValueError
        raise ValueError(f"solid config missing {e.args[0]!r}") from e


TILE_SCHEMA = pa.schema([
    ("lod", pa.int32()),          # 0 = full resolution, 1.. = overviews
    ("band", pa.int32()),
    ("tile_x", pa.int32()),
    ("tile_y", pa.int32()),
    ("valid_w", pa.int32()),      # edge tiles: valid pixels within the block
    ("valid_h", pa.int32()),
    ("dtype", pa.string()),
    ("px", pa.large_binary()),    # full tile_w*tile_h block, C order
])


def solid_dataset(spec: SolidSpec, include_overviews: bool = True,
                  override_parallelism: Optional[int] = None) -> ray.data.Dataset:
    """Generator source: every (lod, band, tile) row of the solid raster.

    Each worker builds the constant block once per (band, level) and
    serializes copies (solid.cpp:443-448 serves every block from one
    pregenerated buffer — memcpy per block)."""
    tw, th = spec.tile_size
    levels = [(0, *spec.size)]
    if include_overviews:
        levels += [(i + 1, w, h) for i, (w, h) in enumerate(spec.overviews())]

    # tiny arithmetic index: one (row-offset, lod, w, h, ntx) entry per
    # (level, band) — O(levels x bands), never O(tiles), so the closure
    # stays broadcast-cheap at any raster size
    chunks: list[tuple[int, int, int, int, int, int]] = []  # (off, lod, bi, w, h, ntx)
    off = 0
    for lod, w, h in levels:
        ntx, nty = num_tiles(w, h, tw, th)
        for bi in range(len(spec.bands)):
            chunks.append((off, lod, bi, w, h, ntx))
            off += ntx * nty
    total = off
    offsets = [c[0] for c in chunks]

    bands = [(b.value, b.data_type) for b in spec.bands]

    def locate_row(rid: int):
        import bisect
        ci = bisect.bisect_right(offsets, rid) - 1
        off, lod, bi, w, h, ntx = chunks[ci]
        rel = rid - off
        return lod, bi, rel % ntx, rel // ntx, w, h

    def gen(batch: dict) -> pa.Table:
        rows = batch["id"]
        cache: dict[tuple[int, str], bytes] = {}
        out = {k: [] for k in ("lod", "band", "tile_x", "tile_y",
                               "valid_w", "valid_h", "dtype", "px")}
        for rid in rows:
            lod, bi, tx, ty, w, h = locate_row(int(rid))
            value, dt = bands[bi]
            key = (bi, dt)
            if key not in cache:
                block = np.full((th, tw), value, dtype=DTYPES[dt])
                cache[key] = block.tobytes()
            out["lod"].append(lod)
            out["band"].append(bi)
            out["tile_x"].append(tx)
            out["tile_y"].append(ty)
            out["valid_w"].append(min(tw, w - tx * tw))
            out["valid_h"].append(min(th, h - ty * th))
            out["dtype"].append(dt)
            out["px"].append(cache[key])
        return pa.table({
            "lod": pa.array(out["lod"], pa.int32()),
            "band": pa.array(out["band"], pa.int32()),
            "tile_x": pa.array(out["tile_x"], pa.int32()),
            "tile_y": pa.array(out["tile_y"], pa.int32()),
            "valid_w": pa.array(out["valid_w"], pa.int32()),
            "valid_h": pa.array(out["valid_h"], pa.int32()),
            "dtype": pa.array(out["dtype"], pa.string()),
            "px": pa.array(out["px"], pa.large_binary()),
        })

    ds = ray.data.range(total, override_num_blocks=override_parallelism)
    return ds.map_batches(gen, batch_format="numpy", batch_size=64)


def create_copy(src_tiles: ray.data.Dataset, values: list[float],
                dtype: Optional[str] = None) -> ray.data.Dataset:
    """CreateCopy semantics (solid.cpp:276-328): derive a constant dataset
    from any tile dataset — same grid/schema, constant `values[band]` per
    band, dtype defaulting to the source's."""

    def const_like(batch: pa.Table) -> pa.Table:
        dts = batch["dtype"].to_pylist()
        bands = batch["band"].to_pylist()
        pxs = []
        for i_row, (b, dt_src) in enumerate(zip(bands, dts)):
            dt = dtype or dt_src
            # size each block from ITS OWN row (row 0's byte length is
            # wrong the moment bands mix dtypes) and keep the exact
            # element count — int(sqrt(n)) silently shrank non-square
            # or non-256 tiles
            n = len(batch["px"][i_row].as_py()) \
                // np.dtype(DTYPES[dt_src]).itemsize
            block = np.full(n, values[b], dtype=DTYPES[dt])
            pxs.append(block.tobytes())
        i = batch.schema.get_field_index("px")
        t = batch.set_column(i, "px", pa.array(pxs, pa.large_binary()))
        if dtype:
            j = t.schema.get_field_index("dtype")
            t = t.set_column(j, "dtype", pa.array([dtype] * t.num_rows))
        return t

    return src_tiles.map_batches(const_like, batch_format="pyarrow")
