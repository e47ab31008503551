"""Reference-parity message transport — SURVEY.md §2A rows 15-17.

Mirrors the reference's channel/port surface
(/root/reference/src/message-transport.lisp): ``MessageChannel`` /
``MessagePort`` / ``Message``, ``connect_port`` / ``disconnect_port`` /
``send_message`` / ``receive_message``, the equality probes
``channel_eq`` / ``port_eq`` and ``port_connected_p``, and the three
error conditions (channel fully occupied, port already connected, port
not connected).

Faithful semantics, Python-native mechanics:

* a channel is a duplex pipe with exactly TWO port slots (car/cdr,
  message-transport.lisp:152-174) — attaching a third port raises
  ``ChannelFullyOccupied``, re-attaching a connected port raises
  ``PortAlreadyConnected``;
* each direction is its own queue: the car port's tx queue IS the cdr
  port's rx queue and vice versa (initialize-local-port-queues,
  message-transport.lisp:120-138), so two connected ports converse;
* ``send_message`` is always asynchronous — "pushing to queue is
  always asynchronous" (message-transport.lisp:198-202);
* ``receive_message`` blocks by default; with ``async_=True`` it
  try-takes and returns ``None`` when empty (lisp:204-209);
* identity is UUID-based like the reference's uuid slots (lisp:3-20).

The reference positions channels as the seam where a distributed
transport would plug in ("simple in-memory queue or AMQP broker",
message-transport.lisp:5-8); in this engine the distributed analog is
Structured Streaming sources/sinks (streaming/stream_queries.py) — this
module is the in-memory twin for API parity.
"""

from __future__ import annotations

import queue
import threading
import uuid
from dataclasses import dataclass, field
from typing import Any


class Message:
    """Generic message base (message-transport.lisp:22-24). Any payload
    object may be sent; subclassing is optional in Python (the Lisp
    hierarchy requirement is a CLOS dispatch artifact)."""


class ChannelFullyOccupied(RuntimeError):
    """Raised when a third port is attached (lisp:75-79)."""


class PortAlreadyConnected(RuntimeError):
    """Raised when a connected port is re-attached (lisp:81-84)."""


class PortNotConnected(RuntimeError):
    """Raised on disconnect/IO through an unattached port (lisp:86-89)."""


@dataclass
class MessageChannel:
    """Two-slot duplex channel (message-transport.lisp:3-10): one queue
    per direction; the slots are the Lisp implementation's tcons
    car/cdr pair."""

    uuid: str = field(default_factory=lambda: str(uuid.uuid4()))
    _car: "MessagePort | None" = field(default=None, repr=False)
    _cdr: "MessagePort | None" = field(default=None, repr=False)
    _q_car_to_cdr: queue.Queue = field(default_factory=queue.Queue, repr=False)
    _q_cdr_to_car: queue.Queue = field(default_factory=queue.Queue, repr=False)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)


@dataclass
class MessagePort:
    """Endpoint connectable to one channel at a time (lisp:12-20)."""

    uuid: str = field(default_factory=lambda: str(uuid.uuid4()))
    channel: MessageChannel | None = field(default=None)
    _rx: queue.Queue | None = field(default=None, repr=False)
    _tx: queue.Queue | None = field(default=None, repr=False)


def channel_eq(a: MessageChannel, b: MessageChannel) -> bool:
    """channel= — UUID identity (lisp:52-55)."""
    return a.uuid == b.uuid


def port_eq(a: MessagePort, b: MessagePort) -> bool:
    """port= — UUID identity (lisp:57-60)."""
    return a.uuid == b.uuid


def port_connected_p(port: MessagePort) -> bool:
    """Whether the port is attached to a channel (lisp:62-66)."""
    return port.channel is not None


def connect_port(port: MessagePort, channel: MessageChannel) -> MessagePort:
    """Attach a port to a channel slot and wire its rx/tx queues
    (connect-port, message-transport.lisp:152-174). Returns the port."""
    if port_connected_p(port):
        raise PortAlreadyConnected(f"port {port.uuid} already connected")
    with channel._lock:
        if channel._car is not None and port_eq(channel._car, port):
            raise PortAlreadyConnected(f"port {port.uuid} already connected")
        if channel._cdr is not None and port_eq(channel._cdr, port):
            raise PortAlreadyConnected(f"port {port.uuid} already connected")
        if channel._car is None:
            channel._car = port
            port._tx, port._rx = channel._q_car_to_cdr, channel._q_cdr_to_car
        elif channel._cdr is None:
            channel._cdr = port
            port._tx, port._rx = channel._q_cdr_to_car, channel._q_car_to_cdr
        else:
            raise ChannelFullyOccupied(
                f"channel {channel.uuid} already has two ports"
            )
        port.channel = channel
    return port


def disconnect_port(port: MessagePort) -> MessagePort:
    """Detach from the current channel, dropping the queue wiring
    (disconnect-port, message-transport.lisp:176-196)."""
    if not port_connected_p(port):
        raise PortNotConnected(f"port {port.uuid} is not connected")
    channel = port.channel
    assert channel is not None
    with channel._lock:
        if channel._car is not None and port_eq(channel._car, port):
            channel._car = None
        elif channel._cdr is not None and port_eq(channel._cdr, port):
            channel._cdr = None
        else:
            raise PortNotConnected(f"port {port.uuid} not on its channel")
    port._rx = port._tx = None
    port.channel = None
    return port


def send_message(port: MessagePort, message: Any, async_: bool = False) -> None:
    """Enqueue toward the peer port. Always asynchronous — the
    reference ignores async? because "pushing to queue is always
    asynchronous" (send-message, message-transport.lisp:198-202)."""
    del async_
    if port._tx is None:
        raise PortNotConnected(f"port {port.uuid} is not connected")
    port._tx.put(message)


def receive_message(port: MessagePort, async_: bool = False) -> Any:
    """Take from the peer direction: blocking by default, try-take
    returning None when ``async_`` (receive-message,
    message-transport.lisp:204-209)."""
    if port._rx is None:
        raise PortNotConnected(f"port {port.uuid} is not connected")
    if async_:
        try:
            return port._rx.get_nowait()
        except queue.Empty:
            return None
    return port._rx.get()
