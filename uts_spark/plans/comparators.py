"""The ``where`` clause compiler.

Reference semantics (/root/reference/uts.ts:217-226 comparator atom,
uts.ts:285-320 conjunction builder):

- an atom is ``{is: '>'|'<'|'=', than: value}``;
- ``where`` maps column → atom or list of atoms; ALL atoms across ALL
  columns are AND-ed (no OR / NOT / BETWEEN — a closed range is two atoms
  on one column);
- a point *missing* the filtered column never matches (uts.ts:297) — in
  SQL three-valued logic ``NULL > v`` is NULL → row filtered out, so plain
  Column comparisons reproduce this exactly (SURVEY.md §2.3 F3);
- for ``remove`` (anti-filter) the reference KEEPS missing-column points,
  so the keep-predicate is ``NOT coalesce(pred, FALSE)``.

Everything compiles to ordinary Column expressions → Catalyst pushes the
conjunction into the parquet scan (visible as PushedFilters in
``.explain``), which is the whole point at 100 TB.
"""

from __future__ import annotations

from functools import reduce
from typing import Any, Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

OPS = (">", "<", "=")

# A comparator atom mirrors the reference's shape: {"is": ">", "than": 5}.
Comparator = Mapping[str, Any]
WhereClause = Mapping[str, "Comparator | Sequence[Comparator]"]


def _atom(col: Column, cmp: Comparator) -> Column:
    op = cmp["is"]
    than = cmp["than"]
    if op == ">":
        return col > F.lit(than)
    if op == "<":
        return col < F.lit(than)
    if op == "=":
        return col == F.lit(than)
    raise ValueError(f"unsupported comparator {op!r}; expected one of {OPS}")


def _atoms(where: WhereClause) -> list[tuple[str, Comparator]]:
    out: list[tuple[str, Comparator]] = []
    for name, spec in where.items():
        if isinstance(spec, Mapping):
            out.append((name, spec))
        else:
            out.extend((name, atom) for atom in spec)
    return out


def compile_where(where: WhereClause | None, resolve=F.col) -> Column | None:
    """Compile a where clause to a single AND-ed Column predicate.

    ``resolve`` maps a column name to a Column — override for map-typed
    payload tables (name → ``payload[name]``).
    """
    if not where:
        return None
    preds = [_atom(resolve(name), cmp) for name, cmp in _atoms(where)]
    return reduce(lambda a, b: a & b, preds)


def keep_predicate_for_remove(where: WhereClause, resolve=F.col) -> Column:
    """Predicate selecting rows that survive ``remove(where)``.

    uts.ts:332-334 keeps ``!comparator(pt)`` and missing-column points never
    match → they are always kept. ``~pred`` alone would drop NULL-predicate
    rows; coalesce to FALSE keeps them.
    """
    pred = compile_where(where, resolve)
    assert pred is not None
    return ~F.coalesce(pred, F.lit(False))


def time_lower_bound(where: WhereClause | None, time_col: str = "time"):
    """The reference's IntervalGrouper consults the raw where clause for the
    FIRST ``time >`` comparator, in array order (uts.ts:113-119 ``.find``).
    Returns its ``than`` value or None."""
    if not where:
        return None
    for name, cmp in _atoms(where):
        if name == time_col and cmp["is"] == ">":
            return cmp["than"]
    return None
