"""Stage recombiner — outer join of stage tables with overwrite semantics.

Re-expresses `combiners/recombiner/recombiner.py:143-178` (SURVEY J3): stage
tables are iteratively joined on their shared id columns; when
``overwrite_columns`` is set, value columns appearing in both sides are
dropped from the accumulated left so the right (newer stage) wins;
otherwise a clash raises.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


class ColumnClashError(ValueError):
    pass


def recombine(
    stages: list[DataFrame],
    id_cols=("grid_id", "date"),
    overwrite_columns: bool = False,
    how: str = "outer",
) -> DataFrame:
    """Outer-join stage tables; optional right-wins overwrite of clashes."""

    def join_two(acc: DataFrame, right: DataFrame) -> DataFrame:
        keys = [c for c in id_cols if c in acc.columns and c in right.columns]
        if not keys:
            # join(on=[]) silently degenerates to a cross join — same
            # guard as wide_combine
            raise ValueError(
                f"recombine: stage shares no id columns {id_cols} with the "
                f"accumulated table (its columns: {sorted(right.columns)})"
            )
        clashes = [
            c
            for c in right.columns
            if c in acc.columns and c not in keys
        ]
        if clashes:
            if not overwrite_columns:
                raise ColumnClashError(
                    f"value columns present in both sides: {clashes}"
                )
            acc = acc.drop(*clashes)
        return acc.join(right, on=keys, how=how)

    return reduce(join_two, stages[1:], stages[0])
