"""Pinning policy contract (operators/_pin.pin): localCheckpoint is a
fault-tolerance trade (non-replicated executor-local blocks) that is
only free in local mode — see the round-8 ADVICE finding the policy
encodes."""

from __future__ import annotations

from graphdb_for_drones_spark.operators._pin import pin


def test_pin_local_mode_checkpoints(spark):
    df = spark.range(10)
    out = pin(df)
    assert out is not df
    # an eager localCheckpoint replaces the plan with a materialized RDD scan
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan
    assert sorted(r.id for r in out.collect()) == list(range(10))


def test_pin_opt_out_env(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_NO_PIN", "1")
    df = spark.range(5)
    assert pin(df) is df


def test_pin_nonlocal_without_checkpoint_dir_is_noop(spark, monkeypatch):
    # simulate a cluster master: the policy must NOT localCheckpoint
    # (irrecoverable on executor loss) and, with no checkpoint dir
    # configured, must return the frame unpinned
    class _FakeSC:
        master = "yarn"

        class _jsc:  # noqa: N801 - mimic py4j attr
            @staticmethod
            def sc():
                class _S:
                    @staticmethod
                    def getCheckpointDir():
                        class _O:
                            @staticmethod
                            def isDefined():
                                return False

                        return _O()

                return _S()

    df = spark.range(5)

    class _FakeSession:
        sparkContext = _FakeSC()

    monkeypatch.setattr(
        type(df), "sparkSession", property(lambda self: _FakeSession())
    )
    assert pin(df) is df
