"""Filter-pushdown Python DataSource (Spark 4.1's
DataSourceReader.pushFilters surface).

``pdrange`` generates rows (id, val) for id in [0, n); the reader
ACCEPTS GreaterThanOrEqual / LessThanOrEqual / EqualTo filters on
``id`` and narrows both its partition ranges AND its generated rows to
the accepted bounds, returning every other filter for Spark to
re-apply post-scan. Correctness of any query over the source therefore
PROVES the pushdown contract end-to-end: if the reader accepted a
filter but failed to apply it, extra rows would reach the result; if
it over-narrowed, rows would go missing — the DuckDB oracle catches
both. The partition count collapsing to the narrowed range is
additionally pinned in pytest.

This is the scan-pruning pattern a 100 TB table source needs: the
filters arrive BEFORE partition planning, so untouched partitions are
never scheduled (the Python-side analog of parquet row-group pruning).
"""

from __future__ import annotations


def _lazy_datasource():
    from pyspark.sql.datasource import (
        DataSource, DataSourceReader, EqualTo, GreaterThanOrEqual,
        InputPartition, LessThanOrEqual)

    class _RangePart(InputPartition):
        def __init__(self, lo: int, hi: int):
            self.lo, self.hi = lo, hi

    class PdRangeReader(DataSourceReader):
        def __init__(self, options):
            self._n = int(options.get("n", 1000))
            self._rows_per_part = int(options.get("rows_per_part", 100))
            self._lo, self._hi = 0, self._n - 1

        def pushFilters(self, filters):
            for f in filters:
                if (isinstance(f, GreaterThanOrEqual)
                        and f.attribute == ("id",)):
                    self._lo = max(self._lo, int(f.value))
                elif (isinstance(f, LessThanOrEqual)
                        and f.attribute == ("id",)):
                    self._hi = min(self._hi, int(f.value))
                elif isinstance(f, EqualTo) and f.attribute == ("id",):
                    self._lo = max(self._lo, int(f.value))
                    self._hi = min(self._hi, int(f.value))
                else:
                    yield f  # not supported here: Spark re-applies it

        def partitions(self):
            parts = []
            lo = self._lo
            while lo <= self._hi:
                hi = min(lo + self._rows_per_part - 1, self._hi)
                parts.append(_RangePart(lo, hi))
                lo = hi + 1
            return parts or [_RangePart(0, -1)]

        def read(self, partition):
            for i in range(partition.lo, partition.hi + 1):
                yield (i, (i * i) % 97)

    class PdRangeDataSource(DataSource):
        @classmethod
        def name(cls):
            return "pdrange"

        def schema(self):
            return "id bigint, val bigint"

        def reader(self, schema):
            return PdRangeReader(self.options)

    return PdRangeDataSource


def register_pdrange_source(spark) -> bool:
    """Register ``pdrange``; False when the Python DataSource API is
    unavailable (same degradation policy as sources/warc.py)."""
    try:
        ds = _lazy_datasource()
    except ImportError:
        return False
    spark.dataSource.register(ds)
    return True
