"""Python UDTF surface (SURVEY.md §2.9 U5 alternate form).

The engine's edge-table explosion normally happens INSIDE the grouped-
map scorer (array -> rows before the Arrow return).  Spark 4's Python
UDTFs offer the same fan-out as a first-class relational operator; this
module provides that form plus a parity test target
(tests/test_contract.py::test_udtf_edge_explode_matches_posexplode).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="parent: string, lag: int, importance: double")
class EdgeExplodeUDTF:
    """Explode one target's (parents, lags, importances) vectors into
    edge rows — the U5 'edge-table explosion per fit' as a UDTF.

    Lateral-join form:
        SELECT t.child, e.* FROM targets t,
               LATERAL edge_explode(t.parents, t.lags, t.importances) e
    """

    def eval(self, parents, lags, importances):  # noqa: D102
        if parents is None:
            return
        for p, k, imp in zip(parents, lags, importances):
            yield p, int(k), float(imp)


def register(spark) -> None:
    """Register as SQL function `edge_explode`."""
    spark.udtf.register("edge_explode", EdgeExplodeUDTF)
