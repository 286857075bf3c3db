"""Blender: N aligned rasters -> weighted mosaic, one 256x256 block at a
time (re-expression of /root/reference/gdal-drivers/blender.cpp).

Plan (SURVEY.md §3.1): spec validation + per-source pixel placement happen
driver-side on the tiny source list (blender.cpp:354-497); source pixel
payloads are broadcast ONCE via ray.put; each Ray task renders a batch of
output blocks — the reference's single-threaded IReadBlock pull loop
becomes a distributed map over the output tile grid.

Per-block math (blender.cpp:559-655), in fp64 regardless of storage type
(blender.cpp:223):
  for each source in CONFIG ORDER (fp-sum determinism, blender.cpp:570):
    l = Locator(block, src.extents); skip if empty       (J1 / M12)
    img  = src window at l.local                         (M13)
    w    = (mask != 0) as 0/1                            (M14)
    w   *= no-overlap: center-in-valid  |  overlap: kernel-area ramp (A2)
    acc[view]  += img * w;  wacc[view] += w              (A1)
  wacc[wacc == 0] = 1;  out = acc / wacc
  out[invalid] = nodata (if set);  convertTo(dtype) saturating
Validity mask block (blender.cpp:657-731): OR over sources of
(mask != 0 AND inside-valid / kernel-area > 0)            (A3).

Two physical plans share the per-block kernel (`blend_dataset` selects by
source payload size): `broadcast` ships sources once via ray.put and maps
over the output grid; `shuffle` (`blend_dataset_shuffle`) flat_maps each
source to its covered output tiles carrying only the overlapping window,
then groupby(tile_id) blends — the SURVEY §2.4 J1 plan for tiled sources
at scale.

Color-table semantics (blender.cpp:526-530): the palette is cloned from
the FIRST source; its presence marks discrete data and disables overlap
blending (palette indices are never averaged).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..grid import (EPS, Extents, align_extents, blend_weights, gt_resolution,
                    is_orthogonal, locate, num_tiles, pixel_rect, pixel_valid,
                    raster_extents, round_half_away)

TILE = 256  # blender.cpp:536-537


@dataclass
class BlendSource:
    """One input raster: orthogonal north-up geotransform + pixel payload
    (H, W) or (H, W, bands) + optional uint8 mask (None = all-valid,
    GMF_ALL_VALID fast path of blender.cpp:274-277) + valid world extents."""

    gt: tuple[float, ...]
    pixels: np.ndarray
    valid: Extents
    mask: Optional[np.ndarray] = None
    # per-band palette [(r, g, b, a), ...] — presence marks DISCRETE data
    # (blender.cpp:526-530) and color interpretation (solid.hpp:79,
    # blender.cpp:304-306); both follow first-source precedence
    color_table: Optional[list[tuple[int, int, int, int]]] = None
    color_interp: Optional[str] = None

    @property
    def size(self) -> tuple[int, int]:
        return (self.pixels.shape[1], self.pixels.shape[0])

    @property
    def bands(self) -> int:
        return 1 if self.pixels.ndim == 2 else self.pixels.shape[2]


@dataclass
class BlendSpec:
    extents: Extents
    overlap: float = 0.0
    srs: str = ""
    dtype: Optional[str] = None       # numpy dtype name; default first source
    resolution: Optional[tuple[float, float]] = None
    nodata: Optional[float] = None


class IncompatibleSources(ValueError):
    pass


def write_blend_config(spec: BlendSpec, datasets: list[tuple[str, Extents]]) -> str:
    """Serialize the spec to the reference INI shape
    (blender.cpp:60-102 writeConfig): `[blender]` extents/overlap/srs/type/
    resolution/nodata + repeated `[dataset]` path/valid sections."""
    import io
    out = io.StringIO()
    e = spec.extents
    out.write("[blender]\n")
    out.write(f"extents = {e.llx!r},{e.lly!r}:{e.urx!r},{e.ury!r}\n")
    out.write(f"overlap = {spec.overlap!r}\n")
    if spec.srs:
        out.write(f"srs = {spec.srs}\n")
    if spec.dtype:
        out.write(f"type = {spec.dtype}\n")
    if spec.resolution:
        out.write(f"resolution = {spec.resolution[0]!r}x{spec.resolution[1]!r}\n")
    if spec.nodata is not None:
        out.write(f"nodata = {spec.nodata!r}\n")
    for path, valid in datasets:
        out.write(f"\n[dataset]\npath = {path}\n")
        out.write(f"valid = {valid.llx!r},{valid.lly!r}:{valid.urx!r},{valid.ury!r}\n")
    return out.getvalue()


def parse_blend_config(text: str) -> tuple[BlendSpec, list[tuple[str, Extents]]]:
    """Parse the INI shape (blender.cpp:733-833 loadConfig); required
    extents/overlap missing -> ValueError (the probe-failure path)."""
    import re
    blender: dict[str, str] = {}
    datasets: list[dict[str, str]] = []
    cur = None
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith((";", "#")):
            continue
        m = re.fullmatch(r"\[(\w+)\]", line)
        if m:
            if m.group(1) == "blender":
                cur = blender
            elif m.group(1) == "dataset":
                datasets.append({})
                cur = datasets[-1]
            else:
                raise ValueError(f"unknown section [{m.group(1)}]")
            continue
        if cur is None or "=" not in line:
            raise ValueError(f"stray line {line!r}")
        k, v = line.split("=", 1)
        cur[k.strip()] = v.strip()

    def ext(s: str) -> Extents:
        ll, ur = s.split(":")
        llx, lly = map(float, ll.split(","))
        urx, ury = map(float, ur.split(","))
        return Extents(llx, lly, urx, ury)

    if "extents" not in blender or "overlap" not in blender:
        raise ValueError("missing required blender.extents/blender.overlap")
    res = None
    if "resolution" in blender:
        w, h = blender["resolution"].split("x")
        res = (float(w), float(h))
    spec = BlendSpec(
        extents=ext(blender["extents"]),
        overlap=float(blender["overlap"]),
        srs=blender.get("srs", ""),
        dtype=blender.get("type"),
        resolution=res,
        nodata=float(blender["nodata"]) if "nodata" in blender else None,
    )
    ds = [(d["path"], ext(d["valid"])) for d in datasets]
    return spec, ds


@dataclass
class BlendPlan:
    """The reference's ImageReference list (blender.cpp:106-118) + grid."""

    extents: Extents                  # aligned
    resolution: tuple[float, float]
    size: tuple[int, int]
    overlap_px: tuple[int, int]
    dtype: np.dtype
    nodata: Optional[float]
    bands: int
    placements: list[tuple[int, int, int, int]]      # int pixel rects
    valids: list[tuple[float, float, float, float]]  # float pixel rects
    color_table: Optional[list[tuple[int, int, int, int]]] = None
    color_interp: Optional[str] = None


def plan_blend(spec: BlendSpec, sources: list[BlendSource]) -> BlendPlan:
    """Driver-side: compatibility checks (blender.cpp:120-185), first-source
    precedence for resolution/origin/dtype (blender.cpp:391-414, 538-540),
    extents alignment (M10) and per-source placement (blender.cpp:480-489)."""
    if not sources:
        raise IncompatibleSources("no sources")
    first = sources[0]
    res0 = gt_resolution(first.gt)
    for i, s in enumerate(sources):
        if not is_orthogonal(s.gt):
            raise IncompatibleSources(f"source {i} is not orthogonal")
        ri = gt_resolution(s.gt)
        if abs(ri[0] - res0[0]) >= EPS or abs(ri[1] - res0[1]) >= EPS:
            raise IncompatibleSources(f"source {i} resolution mismatch")
        if s.bands != first.bands:
            raise IncompatibleSources(f"source {i} band count mismatch")
    resolution = spec.resolution or res0
    origin = (first.gt[0], first.gt[3])       # first-source origin
    extents = align_extents(spec.extents, origin, resolution)
    nx = round_half_away(extents.width / resolution[0])
    ny = round_half_away(extents.height / resolution[1])
    overlap_px = (round_half_away(spec.overlap / resolution[0]),
                  round_half_away(spec.overlap / resolution[1]))
    ul = (extents.llx, extents.ury)
    placements, valids = [], []
    for s in sources:
        se = raster_extents(s.gt, *s.size)
        placements.append(pixel_rect(se, s.size, ul, resolution))
        valids.append(pixel_valid(s.valid, ul, resolution))
    dtype = np.dtype(spec.dtype) if spec.dtype else first.pixels.dtype
    # color table CLONED from the first source (blender.cpp:526-528); its
    # presence marks discrete data and DISABLES overlap blending
    # (blender.cpp:529 `overlap_ = {}`): weights fall back to the
    # center-in-valid 0/1 path — palette indices must never be averaged.
    color_table = [tuple(c) for c in first.color_table] \
        if first.color_table else None
    if color_table is not None:
        overlap_px = (0, 0)
    return BlendPlan(extents=extents, resolution=resolution, size=(nx, ny),
                     overlap_px=overlap_px, dtype=dtype, nodata=spec.nodata,
                     bands=first.bands, placements=placements, valids=valids,
                     color_table=color_table,
                     color_interp=first.color_interp)


def _source_windows(plan: BlendPlan, sources: list[BlendSource],
                    block: tuple[int, int, int, int]):
    """Yield (locator, img fp64 (h,w,b), mask01 fp64, weights geometric)."""
    for src, place, valid in zip(sources, plan.placements, plan.valids):
        loc = locate(block, place)
        if loc is None:
            continue
        lx, ly, lw, lh = loc.local
        img = src.pixels[ly:ly + lh, lx:lx + lw].astype(np.float64)
        if img.ndim == 2:
            img = img[:, :, None]
        if src.mask is None:
            m = np.ones((lh, lw), dtype=np.float64)
        else:
            m = (src.mask[ly:ly + lh, lx:lx + lw] != 0).astype(np.float64)
        w = blend_weights(loc.roi, valid, plan.overlap_px)
        yield loc, img, m, w


def blend_block(plan: BlendPlan, sources: list[BlendSource],
                bx: int, by: int) -> tuple[np.ndarray, np.ndarray]:
    """Render one 256x256 block -> (pixels (256,256,bands) in plan.dtype,
    validity mask uint8 0/255)."""
    block = (bx * TILE, by * TILE, TILE, TILE)
    acc = np.zeros((TILE, TILE, plan.bands), dtype=np.float64)
    wacc = np.zeros((TILE, TILE), dtype=np.float64)
    vmask = np.zeros((TILE, TILE), dtype=np.uint8)
    for loc, img, m, w in _source_windows(plan, sources, block):
        vx, vy, vw, vh = loc.view
        mw = m * w
        acc[vy:vy + vh, vx:vx + vw] += img * mw[:, :, None]
        wacc[vy:vy + vh, vx:vx + vw] += mw
        # validity: mask!=0 AND geometric weight > 0 (blender.cpp:688-723)
        vmask[vy:vy + vh, vx:vx + vw] |= np.where((m != 0) & (w > 0), 255, 0).astype(np.uint8)
    return _finalize_block(plan, acc, wacc, vmask)


def _finalize_block(plan: BlendPlan, acc: np.ndarray, wacc: np.ndarray,
                    vmask: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Shared finalize: div-by-0 guard, nodata fill, saturating convert
    (blender.cpp:638-654)."""
    invalid = wacc == 0.0
    wacc = wacc.copy()
    wacc[invalid] = 1.0
    out = acc / wacc[:, :, None]
    if plan.nodata is not None:
        out[invalid] = plan.nodata
    if np.issubdtype(plan.dtype, np.integer):
        info = np.iinfo(plan.dtype)
        out = np.clip(np.rint(out), info.min, info.max)
    return out.astype(plan.dtype), vmask


BLEND_BROADCAST_LIMIT = 256 << 20  # bytes; above this the shuffle plan wins


def blend_dataset(spec: BlendSpec, sources: list[BlendSource],
                  with_mask: bool = True,
                  physical_plan: str = "auto") -> ray.data.Dataset:
    """Distributed mosaic with two physical plans (same per-block math):

    - 'broadcast' (small mosaics): sources ray.put once, `ray.data.range`
      over the output tile grid renders blocks (T3/T7 pattern).
    - 'shuffle' (tiled sources at scale): flat_map each source to its
      covered output tiles shipping ONLY the overlapping pixel window,
      then groupby(tile_id) blends — the J1 shuffle plan of SURVEY §3.1;
      no task ever holds a whole source.
    - 'auto': shuffle when total source payload exceeds
      BLEND_BROADCAST_LIMIT.
    """
    if physical_plan == "auto":
        total = sum(s.pixels.nbytes + (s.mask.nbytes if s.mask is not None
                                       else 0) for s in sources)
        physical_plan = "shuffle" if total > BLEND_BROADCAST_LIMIT \
            else "broadcast"
    if physical_plan == "shuffle":
        return blend_dataset_shuffle(spec, sources, with_mask)
    plan = plan_blend(spec, sources)
    ntx, nty = num_tiles(*plan.size, TILE, TILE)
    sref = ray.put(sources)
    pref = ray.put(plan)

    def render(batch: dict) -> pa.Table:
        srcs = ray.get(sref)
        pl = ray.get(pref)
        out = {"tile_x": [], "tile_y": [], "px": [], "mask": [],
               "valid_w": [], "valid_h": []}
        for rid in batch["id"]:
            bx, by = int(rid) % ntx, int(rid) // ntx
            px, vm = blend_block(pl, srcs, bx, by)
            out["tile_x"].append(bx)
            out["tile_y"].append(by)
            out["px"].append(px.tobytes())
            out["mask"].append(vm.tobytes() if with_mask else b"")
            out["valid_w"].append(min(TILE, pl.size[0] - bx * TILE))
            out["valid_h"].append(min(TILE, pl.size[1] - by * TILE))
        return pa.table({
            "tile_x": pa.array(out["tile_x"], pa.int32()),
            "tile_y": pa.array(out["tile_y"], pa.int32()),
            "valid_w": pa.array(out["valid_w"], pa.int32()),
            "valid_h": pa.array(out["valid_h"], pa.int32()),
            "px": pa.array(out["px"], pa.large_binary()),
            "mask": pa.array(out["mask"], pa.large_binary()),
        })

    return ray.data.range(ntx * nty).map_batches(render, batch_format="numpy",
                                                 batch_size=16)


def blend_dataset_shuffle(spec: BlendSpec, sources: list[BlendSource],
                          with_mask: bool = True) -> ray.data.Dataset:
    """The J1 shuffle plan (SURVEY §3.1): each source flat_maps to the
    output tiles its placement covers, shipping ONLY the overlapping pixel
    window (each source pixel moves exactly once); groupby(tile_id) then
    accumulates in CONFIG ORDER (blender.cpp:570 fp-sum determinism) with
    the same kernel as the broadcast path.

    Sources are ray.put individually so an explode task holds one source,
    never the whole mosaic; at real scale the source side is already a
    tiled Dataset and the explode is a map over its tiles."""
    plan = plan_blend(spec, sources)
    ntx, nty = num_tiles(*plan.size, TILE, TILE)
    srefs = [ray.put(s) for s in sources]
    pref = ray.put(plan)
    nbands = plan.bands

    def explode(batch: dict) -> pa.Table:
        pl = ray.get(pref)
        out = {"tile_id": [], "src_idx": [], "wh": [], "img": [],
               "dt": [], "m": []}
        for i in batch["src_idx"]:
            i = int(i)
            src = ray.get(srefs[i])
            px0, py0, pw, ph = pl.placements[i]
            bx0 = max(px0 // TILE, 0)
            by0 = max(py0 // TILE, 0)
            bx1 = min((px0 + pw - 1) // TILE, ntx - 1)
            by1 = min((py0 + ph - 1) // TILE, nty - 1)
            for by in range(by0, by1 + 1):
                for bx in range(bx0, bx1 + 1):
                    block = (bx * TILE, by * TILE, TILE, TILE)
                    loc = locate(block, pl.placements[i])
                    if loc is None:
                        continue
                    lx, ly, lw, lh = loc.local
                    img = src.pixels[ly:ly + lh, lx:lx + lw]
                    if img.ndim == 2:
                        img = img[:, :, None]
                    m = b"" if src.mask is None else \
                        np.ascontiguousarray(
                            src.mask[ly:ly + lh, lx:lx + lw]).tobytes()
                    out["tile_id"].append(by * ntx + bx)
                    out["src_idx"].append(i)
                    out["wh"].append((lh << 16) | lw)
                    # ship the NATIVE dtype through the shuffle (a uint8
                    # mosaic would otherwise move 8 bytes/px — the cast
                    # to the float64 accumulate dtype happens AFTER the
                    # exchange, in render_group)
                    out["img"].append(np.ascontiguousarray(img).tobytes())
                    out["dt"].append(str(img.dtype))
                    out["m"].append(m)
        return pa.table({
            "tile_id": pa.array(out["tile_id"], pa.int64()),
            "src_idx": pa.array(out["src_idx"], pa.int32()),
            "wh": pa.array(out["wh"], pa.int32()),
            "img": pa.array(out["img"], pa.large_binary()),
            "dt": pa.array(out["dt"], pa.string()),
            "m": pa.array(out["m"], pa.large_binary()),
        })

    windows = ray.data.from_items(
        [{"src_idx": i} for i in range(len(sources))]) \
        .map_batches(explode, batch_format="numpy", batch_size=1)
    # seed rows guarantee every output tile appears (uncovered -> nodata)
    seeds = ray.data.range(ntx * nty).map_batches(
        lambda b: pa.table({
            "tile_id": pa.array(b["id"].astype(np.int64)),
            "src_idx": pa.array(np.full(len(b["id"]), -1, dtype=np.int32)),
            "wh": pa.array(np.zeros(len(b["id"]), dtype=np.int32)),
            "img": pa.array([b""] * len(b["id"]), pa.large_binary()),
            "dt": pa.array([""] * len(b["id"]), pa.string()),
            "m": pa.array([b""] * len(b["id"]), pa.large_binary()),
        }), batch_format="numpy")

    def render_group(g: pa.Table) -> pa.Table:
        pl = ray.get(pref)
        tid = int(g["tile_id"][0].as_py())
        bx, by = tid % ntx, tid // ntx
        block = (bx * TILE, by * TILE, TILE, TILE)
        acc = np.zeros((TILE, TILE, nbands), dtype=np.float64)
        wacc = np.zeros((TILE, TILE), dtype=np.float64)
        vmask = np.zeros((TILE, TILE), dtype=np.uint8)
        src_idx = g["src_idx"].to_numpy()
        order = np.argsort(src_idx, kind="stable")     # config order
        whs = g["wh"].to_numpy()
        for j in order:
            i = int(src_idx[j])
            if i < 0:
                continue
            loc = locate(block, pl.placements[i])
            lh, lw = int(whs[j]) >> 16, int(whs[j]) & 0xFFFF
            img = np.frombuffer(g["img"][j].as_py(),
                                dtype=np.dtype(g["dt"][j].as_py())) \
                .reshape(lh, lw, nbands).astype(np.float64)
            mb = g["m"][j].as_py()
            m = np.ones((lh, lw), dtype=np.float64) if not mb else \
                (np.frombuffer(mb, dtype=np.uint8)
                 .reshape(lh, lw) != 0).astype(np.float64)
            w = blend_weights(loc.roi, pl.valids[i], pl.overlap_px)
            vx, vy, vw, vh = loc.view
            mw = m * w
            acc[vy:vy + vh, vx:vx + vw] += img * mw[:, :, None]
            wacc[vy:vy + vh, vx:vx + vw] += mw
            vmask[vy:vy + vh, vx:vx + vw] |= \
                np.where((m != 0) & (w > 0), 255, 0).astype(np.uint8)
        px, vm = _finalize_block(pl, acc, wacc, vmask)
        return pa.table({
            "tile_x": pa.array([bx], pa.int32()),
            "tile_y": pa.array([by], pa.int32()),
            "valid_w": pa.array([min(TILE, pl.size[0] - bx * TILE)],
                                pa.int32()),
            "valid_h": pa.array([min(TILE, pl.size[1] - by * TILE)],
                                pa.int32()),
            "px": pa.array([px.tobytes()], pa.large_binary()),
            "mask": pa.array([vm.tobytes() if with_mask else b""],
                             pa.large_binary()),
        })

    return windows.union(seeds).groupby("tile_id").map_groups(
        render_group, batch_format="pyarrow")


def blend_oracle(plan: BlendPlan, sources: list[BlendSource]) -> tuple[np.ndarray, np.ndarray]:
    """Whole-raster oracle, INDEPENDENT of the block decomposition: each
    source accumulates into full-size buffers in one shot (treating the
    entire output as a single block). Comparing it against tiled rendering
    proves the 256x256 decomposition is seamless."""
    nx, ny = plan.size
    acc = np.zeros((ny, nx, plan.bands), dtype=np.float64)
    wacc = np.zeros((ny, nx), dtype=np.float64)
    vmask = np.zeros((ny, nx), dtype=np.uint8)
    for loc, img, m, w in _source_windows(plan, sources, (0, 0, nx, ny)):
        vx, vy, vw, vh = loc.view
        mw = m * w
        acc[vy:vy + vh, vx:vx + vw] += img * mw[:, :, None]
        wacc[vy:vy + vh, vx:vx + vw] += mw
        vmask[vy:vy + vh, vx:vx + vw] |= np.where((m != 0) & (w > 0), 255, 0).astype(np.uint8)
    return _finalize_block(plan, acc, wacc, vmask)
