"""Driver registry + probing open — the user-extension surface (S14).

Mirrors the reference's registration model (register.cpp:37-47: each driver
exposes Identify/Open hooks; GDAL's manager probes them in order, each Open
sniffs its input and declines on mismatch — solid.cpp:209-219, mask.cpp:
100-108, blender.cpp:777-795) including MVT's replace-a-same-named-driver
behavior (mvt.cpp:821-829).

Engine shape: a driver is `(identify, open_fn)`; `open_dataset(src, **opts)`
probes registered drivers in registration order and returns the first
driver's `ray.data.Dataset`. Users extend the engine by registering their
own `{name: (identify, opener)}` — the openers are ordinary functions
composing library stages, no plugin machinery needed.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

Identify = Callable[[Any], bool]
Opener = Callable[..., Any]  # (src, **opts) -> ray.data.Dataset


@dataclass(frozen=True)
class Driver:
    name: str
    identify: Identify
    open: Opener
    description: str = ""


_DRIVERS: dict[str, Driver] = {}
_ORDER: list[str] = []


class UnknownFormat(ValueError):
    pass


def register_driver(name: str, identify: Identify, opener: Opener,
                    description: str = "", replace: bool = False) -> None:
    """Register a driver. A same-named driver is replaced only with
    replace=True (the mvt.cpp:821-829 deregister-then-register semantics);
    otherwise re-registration raises."""
    if name in _DRIVERS and not replace:
        raise ValueError(f"driver {name!r} already registered "
                         "(pass replace=True to swap it)")
    if name in _DRIVERS:
        # true deregister-then-register (mvt.cpp:821-829): the
        # replacement moves to the END of the probe order, behind more
        # specific drivers — keeping the old slot would give a swapped-in
        # greedy identify() first pick
        _ORDER.remove(name)
    _ORDER.append(name)
    _DRIVERS[name] = Driver(name, identify, opener, description)


def deregister_driver(name: str) -> bool:
    if name in _DRIVERS:
        del _DRIVERS[name]
        _ORDER.remove(name)
        return True
    return False


def drivers() -> list[Driver]:
    return [_DRIVERS[n] for n in _ORDER]


def open_dataset(src: Any, driver: Optional[str] = None, **opts):
    """Probe registered drivers in order; first identify() match opens.

    `driver=` skips probing (GDAL's allowed-drivers restriction). Raises
    UnknownFormat when nothing claims the source."""
    if driver is not None:
        if driver not in _DRIVERS:
            raise UnknownFormat(f"no driver named {driver!r}")
        return _DRIVERS[driver].open(src, **opts)
    for d in drivers():
        try:
            claimed = d.identify(src)
        except Exception:
            claimed = False  # a probe must never abort the loop
        if claimed:
            return d.open(src, **opts)
    raise UnknownFormat(f"no registered driver identifies {type(src).__name__} "
                        f"source {str(src)[:80]!r}")


# ---------------------------------------------------------------------------
# built-in drivers
# ---------------------------------------------------------------------------

def _is_text(src: Any) -> Optional[str]:
    if isinstance(src, str):
        return src
    if isinstance(src, bytes):
        try:
            return src.decode()
        except UnicodeDecodeError:
            return None
    return None


def _solid_identify(src: Any) -> bool:
    t = _is_text(src)
    return t is not None and "[solid]" in t


def _solid_open(src: Any, **opts):
    from .sources import solid
    return solid.solid_dataset(solid.parse_config(_is_text(src)), **opts)


def _mask_identify(src: Any) -> bool:
    from .sources import mask
    return isinstance(src, (bytes, bytearray)) and \
        bytes(src[:6]) == mask.MAGIC


def _mask_open(src: Any, **opts):
    from .sources import mask
    return mask.mask_tiles(bytes(src), **opts)


def _blend_identify(src: Any) -> bool:
    t = _is_text(src)
    return t is not None and "[blender]" in t


def _blend_open(src: Any, **opts):
    from .stages import blend
    spec, _datasets = blend.parse_blend_config(_is_text(src))
    sources = opts.pop("sources", None)
    if sources is None:
        raise ValueError("blend open needs sources=[BlendSource,...] "
                         "(tile datasets are passed in-process, the engine "
                         "equivalent of blender:ptr= config injection, "
                         "blender.cpp:868-889)")
    return blend.blend_dataset(spec, sources, **opts)


def _mvt_identify(src: Any) -> bool:
    from .sources.mvt import is_remote_mvt
    return isinstance(src, str) and (src.startswith("mvt:")
                                     or is_remote_mvt(src))


def _mvt_open(src: Any, **opts):
    """Path router (S11, mvt.cpp:732-811): remote mvt URLs (S10) fetch
    through an injected transport (`fetcher=` open option — mirrors
    loadFromRemote incl. 404 = open failure); `mvt:<store>/<z>-<x>-<y>`
    goes through the S12 keyed lookup."""
    import ray.data

    from .grid import parse_tile_key
    from .sources import mvt, tilestore

    if mvt.is_remote_mvt(src):
        fetcher = opts.get("fetcher")
        if fetcher is None:
            raise ValueError(
                "remote mvt paths need a `fetcher=` open option (no "
                "network transport ships in this engine; see "
                "sources.mvt.load_from_remote)")
        buf = mvt.load_from_remote(src, fetcher)
        if buf is None:                      # 404 -> open failure
            raise FileNotFoundError(f"remote tile not found: {src!r}")
        rows = mvt.decode_tile(buf, extents=opts.get("extents"))
        return ray.data.from_arrow(mvt.rows_to_table(rows, tile_id=src))

    rest = src[len("mvt:"):]
    store_path, _, key = rest.rpartition("/")
    if parse_tile_key(key) is None:
        raise ValueError(f"bad tile key {key!r} in {src!r}")
    reqs = ray.data.from_items([{"path": key}])
    blobs = tilestore.lookup(reqs, store_path)
    extents = opts.get("extents")

    def decode(b):
        import pyarrow as pa
        out = []
        for tid, status, buf in zip(b["path"].to_pylist(),
                                    b["status"].to_pylist(),
                                    b["tile_data"].to_pylist()):
            if status != "ok" or buf is None:
                continue
            rows = mvt.decode_tile(buf, extents=extents)
            out.append(mvt.rows_to_table(rows, tile_id=tid))
        if not out:
            return mvt.rows_to_table([], tile_id=None)
        return pa.concat_tables(out)

    return blobs.map_batches(decode, batch_format="pyarrow")


def _images_identify(src: Any) -> bool:
    """input_hint table path (parquet file or multi-file directory with the
    image schema)."""
    import os

    if not isinstance(src, str) or not os.path.exists(src):
        return False
    import pyarrow.parquet as pq
    try:
        if os.path.isdir(src):
            parts = [f for f in os.listdir(src) if f.endswith(".parquet")]
            if not parts:
                return False
            names = pq.read_schema(os.path.join(src, parts[0])).names
        else:
            names = pq.read_schema(src).names
    except Exception:
        return False
    return {"image_id", "bytes", "fmt", "caption", "phash"} <= set(names)


def _images_open(src: Any, **opts):
    """input_hint table -> decoded tile-index Dataset (the flagship read)."""
    from . import fixtures
    from .pipelines import flagship

    lod = opts.pop("lod", None)
    if lod is None:
        lod = fixtures.lod_for_count(fixtures.count_rows(src))
    return flagship.tile_index(src, lod, **opts)


def register_builtins() -> None:
    """Idempotent registration of the four reference drivers
    (register.cpp:37-47 registerAll)."""
    for name, ident, op, desc in [
        ("solid", _solid_identify, _solid_open,
         "constant-value tiled raster from INI config (solid.cpp)"),
        ("mask", _mask_identify, _mask_open,
         "quadtree-mask raster from serialized buffer (mask.cpp)"),
        ("blender", _blend_identify, _blend_open,
         "weighted mosaic from INI config + in-process sources (blender.cpp)"),
        ("mvt", _mvt_identify, _mvt_open,
         "vector tile via keyed store lookup (mvt.cpp + mbtiles.cpp)"),
        ("images", _images_identify, _images_open,
         "input_hint image+caption table -> decoded tile index"),
    ]:
        if name not in _DRIVERS:
            register_driver(name, ident, op, desc)


register_builtins()
