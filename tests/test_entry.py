

def test_gate_window_contains_promoted_queries():
    """The driver's CORRECTNESS gate checks exactly the first 50 entries
    of queries() (dict order).  Guard the round-4 rotation: everything in
    _GATE_FIRST — the 8 queries that had never had a driver row through
    round 3 plus the round-4 additions — must sit inside that window."""
    import __spark_entry__ as E
    from graphdb_for_drones_spark.plans import _GATE_FIRST

    first50 = list(E.queries())[:50]
    missing = [n for n in _GATE_FIRST if n not in first50]
    assert missing == []
