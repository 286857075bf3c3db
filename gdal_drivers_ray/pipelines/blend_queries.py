"""Query entries for the blend mosaic pipeline (blender.cpp semantics),
SQL-checked: the oracle embeds per-tile-row checksums computed by the
WHOLE-RASTER NumPy oracle (stages.blend.blend_oracle — one accumulation
over the full output, no tile decomposition, no shuffle, no Ray), so any
drift in the distributed J1 join / A1-A3 aggregation paths hash-fails."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from ..grid import Extents
from ..stages import blend as bl


def _fixture_mosaic() -> tuple[bl.BlendSpec, list[bl.BlendSource]]:
    """Deterministic 3-source mosaic with touching valid extents and an
    overlap ramp (FIXTURES.md F4)."""
    rng = np.random.default_rng(42)
    sources = []
    for i, (ox, vx0, vx1) in enumerate([(0, 0, 280), (250, 280, 580),
                                        (550, 580, 850)]):
        px = rng.integers(0, 255, (512, 300)).astype(np.uint8)
        gt = (float(ox), 1.0, 0.0, 512.0, 0.0, -1.0)
        sources.append(bl.BlendSource(
            gt=gt, pixels=px,
            valid=Extents(float(vx0), 0.0, float(vx1), 512.0)))
    spec = bl.BlendSpec(extents=Extents(0, 0, 850, 512), overlap=15.0,
                        nodata=0.0)
    return spec, sources


def q_blend_mosaic(sf_dir: str) -> ray.data.Dataset:
    """Distributed mosaic render -> per-tile-row checksums (exercises the
    full J1 join + A1/A2 weighting + A3 mask path)."""
    return _blend_stats(bl.blend_dataset(*_blend_args()))


def q_blend_shuffle(sf_dir: str) -> ray.data.Dataset:
    """Same mosaic through the SHUFFLE physical plan (flat_map source
    windows -> groupby(tile_id)); must produce checksums identical to
    q_blend_mosaic — the cross-plan parity is the test."""
    spec, sources = _blend_args()
    return _blend_stats(bl.blend_dataset(spec, sources,
                                         physical_plan="shuffle"))


def _blend_args():
    return _fixture_mosaic()


def _blend_stats(tiles: ray.data.Dataset) -> ray.data.Dataset:
    def stats(b: pa.Table) -> pa.Table:
        sums, valid = [], []
        for px, m, vw, vh in zip(b["px"].to_pylist(), b["mask"].to_pylist(),
                                 b["valid_w"].to_numpy(), b["valid_h"].to_numpy()):
            arr = np.frombuffer(px, np.uint8).reshape(256, 256)
            msk = np.frombuffer(m, np.uint8).reshape(256, 256)
            sums.append(int(arr[:vh, :vw].astype(np.int64).sum()))
            valid.append(int((msk[:vh, :vw] == 255).sum()))
        return pa.table({"tile_y": b["tile_y"].cast(pa.int64()),
                         "px_sum": pa.array(sums, pa.int64()),
                         "valid_px": pa.array(valid, pa.int64())})

    return tiles.map_batches(stats, batch_format="pyarrow") \
                .groupby("tile_y").aggregate(
                    Sum("px_sum", alias_name="px_sum"),
                    Sum("valid_px", alias_name="valid_px"))


def _sql_blend() -> str:
    """Whole-raster render of the fixture mosaic -> per-tile-row sums as a
    VALUES table. blend_oracle accumulates every source over the FULL
    output extents in one shot — the 256x256 tiling, the tile x source
    join (both physical plans) and the groupby reduction under test play
    no part in producing these numbers."""
    spec, sources = _fixture_mosaic()
    plan = bl.plan_blend(spec, sources)
    out, vmask = bl.blend_oracle(plan, sources)
    if out.ndim == 3:
        out = out[:, :, 0]
    nx, ny = plan.size
    rows = []
    for ty in range((ny + 255) // 256):
        band = slice(ty * 256, min((ty + 1) * 256, ny))
        rows.append(f"({ty}, {int(out[band].astype(np.int64).sum())}, "
                    f"{int((vmask[band] == 255).sum())})")
    values = ",\n    ".join(rows)
    return f"""
SELECT CAST(tile_y AS BIGINT) AS tile_y,
       CAST(px_sum AS BIGINT) AS px_sum,
       CAST(valid_px AS BIGINT) AS valid_px
FROM (VALUES {values}) t(tile_y, px_sum, valid_px)
"""


SQL_BLEND = _sql_blend()
