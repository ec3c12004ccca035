"""kit_ray — Ray-Data-native crawl frontier + training-data engine."""


def _strip_pandas_block_metadata() -> None:
    """Make pandas-derived blocks shuffle-clean.

    ``pa.Table.from_pandas`` attaches ``b'pandas'`` schema metadata
    whose nested dict makes ``pa.Schema`` unhashable; every hash-join /
    sort over such blocks then logs ``Failed to hash the schemas (for
    deduplication)`` per block and loses the shuffle's schema dedup
    (shipping redundant schema bytes with each block). The metadata
    records only pandas index reconstruction info, which Ray never uses
    (indexes are not preserved across blocks), so strip it at the one
    conversion boundary instead of in every pandas map. Guarded: a Ray
    upgrade that moves the hook degrades to the old (noisy) behavior.
    """
    try:
        from ray.data._internal.pandas_block import PandasBlockAccessor
    except ImportError:  # pragma: no cover - ray internals moved
        return
    orig = getattr(PandasBlockAccessor, "to_arrow", None)
    if orig is None or getattr(orig, "_kit_ray_stripped", False):
        return  # pragma: no cover - already patched / hook moved

    def to_arrow(self):
        t = orig(self)
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    to_arrow._kit_ray_stripped = True
    PandasBlockAccessor.to_arrow = to_arrow


_strip_pandas_block_metadata()
