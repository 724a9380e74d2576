"""Every queries() entry must match its DuckDB oracle at sf0.001.

This mirrors the driver's correctness gate (row count + column names +
order-insensitive value comparison) so regressions surface in pytest first.
"""

from __future__ import annotations

import datetime
import decimal
import math

import pytest

from tests.conftest import SF_SMALL


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6g}"
    if isinstance(v, decimal.Decimal):
        return f"{float(v):.6g}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def _query_names():
    from arroyo_spark import queries as q

    return sorted(q.QUERIES)


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, duck, name):
    from arroyo_spark import queries as q

    sdf = q.QUERIES[name](spark, SF_SMALL)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if name not in q.ORACLES:
        assert len(srows) > 0, f"{name}: rows-only check got zero rows"
        return
    cur = duck.execute(q.ORACLES[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch"
    assert len(srows) == len(drows), f"{name}: rowcount {len(srows)} vs {len(drows)}"
    sc, dc = canon(srows, scols), canon(drows, dcols)
    assert sc == dc, f"{name}: value mismatch, first diff spark={next(iter(set(map(tuple, sc)) - set(map(tuple, dc))), None)}"
