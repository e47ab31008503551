"""Behavior tests for the transactional-container facade
(hive_task_spark/containers.py — reference protocol:
/root/reference/src/primitives.lisp:12-43)."""

from __future__ import annotations

import threading

import pytest

from hive_task_spark.containers import (
    Cell,
    Cons,
    FifoQueue,
    FiloQueue,
    HashTable,
    MulticastChannel,
    MulticastPort,
    SortedMap,
    TList,
)


def test_cell_cons_list_protocol():
    c = Cell()
    assert c.empty_p() and not c.full_p()
    c.put(7)
    assert c.peek() == 7 and not c.empty_p()
    v, ok = c.try_take()
    assert (v, ok) == (7, True)
    assert c.try_take() == (None, False)

    pair = Cons(1, 2)
    pair.car, pair.cdr = 10, 20
    assert (pair.car, pair.cdr) == (10, 20)

    lst = TList([2, 3])
    lst.push(1)
    assert lst.to_list() == [1, 2, 3]
    assert lst.pop() == 1
    lst.empty_()
    assert lst.empty_p()


def test_queue_disciplines():
    fifo, filo = FifoQueue(), FiloQueue()
    for q in (fifo, filo):
        for x in (1, 2, 3):
            assert q.try_put(x)
    assert [fifo.take() for _ in range(3)] == [1, 2, 3]
    assert [filo.take() for _ in range(3)] == [3, 2, 1]
    with pytest.raises(TimeoutError):
        fifo.take(timeout=0.05)


def test_take_blocks_until_put():
    q = FifoQueue()
    got = []
    t = threading.Thread(target=lambda: got.append(q.take(timeout=5)))
    t.start()
    q.put("x")
    t.join(timeout=5)
    assert got == ["x"]


def test_hash_table_requires_valid_test_and_kv_protocol():
    with pytest.raises(ValueError):
        HashTable(test="bogus")
    h = HashTable()
    h.set_value("a", 1)
    h.set_value("b", 2)
    assert h.entry_count() == 2
    assert h.get_value("a") == 1 and h.get_value("zz", 99) == 99
    assert h.rem_value("a") and not h.rem_value("a")
    cp = h.copy_container()
    h.empty_()
    assert h.empty_p() and cp.get_value("b") == 2


def test_sorted_map_orders_by_predicate():
    with pytest.raises(TypeError):
        SortedMap()  # predicate is mandatory (primitives.lisp:137-139)
    m = SortedMap(predicate=lambda a, b: a > b)  # descending
    for k in (3, 1, 4, 1, 5, 9, 2):
        m.set_value(k, k * 10)
    assert m.container_keys() == [9, 5, 4, 3, 2, 1]
    assert m.container_values() == [90, 50, 40, 30, 20, 10]
    assert m.first_pair() == (9, 90) and m.last_pair() == (1, 10)
    assert m.rem_value(4)
    assert m.container_keys() == [9, 5, 3, 2, 1]
    assert m.get_value(4, "gone") == "gone"
    seen = []
    m.map_container(lambda k, v: seen.append(k))
    assert seen == [9, 5, 3, 2, 1]
    cp = m.copy_container()
    assert cp.container_pairs() == m.container_pairs()


def test_multicast_channel_fanout_and_late_port():
    ch = MulticastChannel()
    with pytest.raises(ValueError):
        MulticastPort()  # port cannot exist without a channel
    p1 = ch.connect()
    ch.put("early")
    p2 = ch.connect()  # late subscriber misses "early"
    ch.put("late")
    assert [p1.take() for _ in range(2)] == ["early", "late"]
    assert p2.take() == "late" and p2.empty_p()
    with pytest.raises(TypeError):
        p1.put("no")  # ports are read-only
