"""Behavior tests for the message-transport parity shim
(/root/reference/src/message-transport.lisp semantics)."""

from __future__ import annotations

import threading

import pytest

from hive_task_spark.transport import (
    ChannelFullyOccupied,
    MessageChannel,
    MessagePort,
    PortAlreadyConnected,
    PortNotConnected,
    channel_eq,
    connect_port,
    disconnect_port,
    port_connected_p,
    port_eq,
    receive_message,
    send_message,
)


def test_duplex_conversation():
    """Two connected ports converse: each port's sends arrive at the
    other's receives, in order, and never loop back."""
    ch = MessageChannel()
    a, b = connect_port(MessagePort(), ch), connect_port(MessagePort(), ch)
    send_message(a, "ping-1")
    send_message(a, "ping-2")
    send_message(b, "pong")
    assert receive_message(b) == "ping-1"
    assert receive_message(b) == "ping-2"
    assert receive_message(a) == "pong"
    assert receive_message(a, async_=True) is None  # own sends don't loop back


def test_async_receive_returns_none_when_empty():
    ch = MessageChannel()
    a = connect_port(MessagePort(), ch)
    assert receive_message(a, async_=True) is None


def test_blocking_receive_waits_for_peer():
    ch = MessageChannel()
    a, b = connect_port(MessagePort(), ch), connect_port(MessagePort(), ch)
    got = []
    t = threading.Thread(target=lambda: got.append(receive_message(b)))
    t.start()
    send_message(a, 42)
    t.join(timeout=2.0)
    assert got == [42]


def test_third_port_rejected():
    ch = MessageChannel()
    connect_port(MessagePort(), ch)
    connect_port(MessagePort(), ch)
    with pytest.raises(ChannelFullyOccupied):
        connect_port(MessagePort(), ch)


def test_reconnect_rejected_until_disconnected():
    ch = MessageChannel()
    p = connect_port(MessagePort(), ch)
    with pytest.raises(PortAlreadyConnected):
        connect_port(p, ch)
    disconnect_port(p)
    assert not port_connected_p(p)
    connect_port(p, ch)  # slot freed — reconnect succeeds
    assert port_connected_p(p)


def test_io_requires_connection():
    p = MessagePort()
    with pytest.raises(PortNotConnected):
        send_message(p, "x")
    with pytest.raises(PortNotConnected):
        receive_message(p)
    with pytest.raises(PortNotConnected):
        disconnect_port(p)


def test_identity_probes():
    ch1, ch2 = MessageChannel(), MessageChannel()
    p1, p2 = MessagePort(), MessagePort()
    assert channel_eq(ch1, ch1) and not channel_eq(ch1, ch2)
    assert port_eq(p1, p1) and not port_eq(p1, p2)
