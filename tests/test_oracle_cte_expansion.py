"""Static guard for the CTE-inlining blowup (the k-core lesson): DuckDB
inlines a plain (non-MATERIALIZED) CTE once PER REFERENCE, so a chain of
unrolled rounds where each stage is read by two consumers plans 2^rounds
copies of the base tree — invisible at the sf0.01 gate, disk-full at
sf0.1.  This test parses every oracle's WITH clause, builds the CTE
reference graph, and computes how many times each plain CTE would be
instantiated under inline-per-reference semantics; any plain CTE whose
instantiation count exceeds the bound fails with the fix spelled out.
"""

import re

import pytest

from graphdb_for_drones_spark.plans import ORACLES

# 8 = a harmless constant factor; the failure class is EXPONENTIAL
# (2^rounds), so real regressions blow far past any reasonable bound.
MAX_INSTANTIATIONS = 8


def parse_ctes(sql: str):
    """Return ([(name, materialized, body)...], tail) for one WITH
    clause — bodies found by paren matching, definitions in order."""
    m = re.search(r"\bWITH\b", sql)
    if not m:
        return [], sql
    pos = m.end()
    defs = []
    while True:
        head = re.compile(
            r"\s*,?\s*([A-Za-z_]\w*)\s*(?:\([^)]*\))?\s+AS\s+(MATERIALIZED\s+)?\(",
        ).match(sql, pos)
        if not head:
            break
        name, mat = head.group(1), bool(head.group(2))
        depth, i = 1, head.end()
        while depth and i < len(sql):
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        defs.append((name, mat, sql[head.end() : i - 1]))
        pos = i
    return defs, sql[pos:]


def reference_counts(text: str, names):
    return {
        n: len(re.findall(r"(?:FROM|JOIN)\s+" + re.escape(n) + r"\b", text))
        for n in names
    }


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_cte_expansion_bounded(name):
    sql = ORACLES[name]
    defs, tail = parse_ctes(sql)
    if not defs:
        return
    names = [d[0] for d in defs]
    mat = {n: m for n, m, _ in defs}
    body = {n: b for n, _, b in defs}

    # instantiations under inline-per-reference: walk consumers from the
    # final query; a MATERIALIZED CTE executes once regardless of its
    # own instantiation count, so it resets the multiplier for its deps
    inst = {n: 0 for n in names}
    order = list(reversed(names))  # later CTEs consume earlier ones

    def consume(text, multiplier):
        for n, c in reference_counts(text, names).items():
            if c:
                inst[n] += c * multiplier

    consume(tail, 1)
    for n in order:
        if inst[n] == 0:
            continue
        multiplier = 1 if mat[n] else inst[n]
        consume(body[n], multiplier)

    offenders = {
        n: c
        for n, c in inst.items()
        if c > MAX_INSTANTIATIONS and not mat[n]
    }
    assert not offenders, (
        f"{name}: plain CTEs would inline more than "
        f"{MAX_INSTANTIATIONS}x under per-reference expansion — mark "
        f"them AS MATERIALIZED (the k-core 2^rounds lesson): {offenders}"
    )
