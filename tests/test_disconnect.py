"""Disconnect / broker-restart semantics (reference: systemtest
emitter_disconnect_test.go and proc_disconnect_test.go — clients must
survive a broker bounce mid-loop with no lost and no doubled records).

The restart helper brings a fresh FakeBroker up on the SAME address
carrying over the topic logs and group/offset state — a broker whose
storage survived the bounce, which is what the systemtests run
against (docker restart, persistent volume)."""

import pytest

from goka_spark.kafka_wire import (
    FakeBroker,
    WireConsumer,
    WireGroupMember,
    WireProducer,
    WireTopicManager,
)


def _restart(broker: FakeBroker) -> FakeBroker:
    host, port = broker._host, broker._port
    topics, groups = broker.topics, broker.groups
    modern = broker.modern
    broker.stop()
    nb = FakeBroker(host, port, modern=modern).start()
    nb.topics = topics
    nb.groups = groups
    return nb


@pytest.mark.parametrize("modern", [False, True])
def test_emitter_survives_broker_restart(modern):
    """emitter_disconnect_test.go: the producer keeps emitting across
    a broker bounce — the first emit after the restart hits the dead
    socket, re-dials, re-negotiates and resends.  Offsets stay
    contiguous: nothing lost, nothing doubled."""
    b = FakeBroker(modern=modern).start()
    tm = prod = cons = None
    try:
        tm = WireTopicManager([b.address])
        tm.ensure_stream_exists("ds", 1)
        prod = WireProducer([b.address])
        offs = [prod.emit("ds", "k", f"v{i}".encode(), partition=0)[1]
                for i in range(3)]
        b = _restart(b)
        offs += [prod.emit("ds", "k", f"v{i}".encode(), partition=0)[1]
                 for i in range(3, 6)]
        assert offs == list(range(6))
        cons = WireConsumer([b.address])
        got = cons.fetch("ds", 0, 0)
        assert [r.value for r in got] == \
            [f"v{i}".encode() for i in range(6)]
    finally:
        for c in (cons, prod, tm):
            if c is not None:
                c.close()
        b.stop()


def test_consumer_fetch_resumes_after_restart():
    """proc_disconnect_test.go (fetch half): a consumer mid-stream
    when the broker bounces re-fetches from the SAME offset after
    reconnecting — the offset cursor lives with the caller, so the
    record sequence has no gap and no repeat."""
    b = FakeBroker().start()
    tm = prod = cons = None
    try:
        tm = WireTopicManager([b.address])
        tm.ensure_stream_exists("dc", 1)
        prod = WireProducer([b.address])
        for i in range(6):
            prod.emit("dc", "k", f"v{i}".encode(), partition=0)
        cons = WireConsumer([b.address])
        first = cons.fetch("dc", 0, 0, max_bytes=200)
        assert first and first[0].offset == 0
        nxt = first[-1].offset + 1
        b = _restart(b)
        rest = cons.fetch("dc", 0, nxt)
        seen = [r.offset for r in first] + [r.offset for r in rest]
        assert seen == list(range(6))  # no gap, no repeat
    finally:
        for c in (cons, prod, tm):
            if c is not None:
                c.close()
        b.stop()


def test_topic_manager_survives_restart():
    b = FakeBroker().start()
    tm = None
    try:
        tm = WireTopicManager([b.address])
        tm.ensure_stream_exists("tt", 2)
        b = _restart(b)
        assert tm.partitions("tt") == [0, 1]  # metadata over the re-dial
    finally:
        if tm is not None:
            tm.close()
        b.stop()


def test_group_member_rejoins_after_restart(spark):
    """proc_disconnect_test.go (group half): a processor's group
    member detects the bounce at its next heartbeat (False — the
    standard 'rebalance' signal), rejoins through the re-dialed
    coordinator, and resumes from its COMMITTED offsets — processed
    records are neither lost nor re-delivered."""
    from goka_spark.sources import poll_group_records

    b = FakeBroker().start()
    tm = prod = cons = m = None
    try:
        tm = WireTopicManager([b.address])
        tm.ensure_stream_exists("dg", 2)
        prod = WireProducer([b.address])
        cons = WireConsumer([b.address])
        for i in range(4):
            prod.emit("dg", f"user-{i % 3}", f"v{i}".encode())
        m = WireGroupMember([b.address], "grp-dg", ["dg"])
        m.join()
        frame, nxt = poll_group_records(spark, m, cons)
        assert len(frame.collect()) == 4
        m.commit_offsets(nxt)
        assert m.heartbeat() is True

        b = _restart(b)

        # first contact after the bounce: heartbeat reports not-
        # healthy (after re-dialing) -> the caller's rejoin path
        assert m.heartbeat() is False
        m.join()
        for i in range(4, 7):
            prod.emit("dg", f"user-{i % 3}", f"v{i}".encode())
        frame2, nxt2 = poll_group_records(spark, m, cons)
        vals = sorted(bytes(r.value) for r in frame2.collect())
        # exactly the post-commit records: nothing lost, nothing doubled
        assert vals == sorted(f"v{i}".encode() for i in range(4, 7))
        m.commit_offsets(nxt2)
    finally:
        for c in (m, cons, prod, tm):
            if c is not None:
                c.close()
        b.stop()
