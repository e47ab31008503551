"""Transactional-container facade — the reference's generic container
protocol re-expressed for the Spark driver side.

The reference (/root/reference/src/primitives.lisp:12-43 generics,
:60-143 classes) wraps STM containers: cell, cons, list, FIFO/FILO
queue, multicast channel+port, hash table, and a comparator-ordered
sorted map. On Spark, distributed data lives in DataFrames; these
containers exist for DRIVER-SIDE coordination (work hand-off between
threads feeding `scheduler.put_work`, result fan-out), so the honest
analog is lock-based atomicity per operation ("STM-lite": every public
method is atomic, `take` blocks like an STM retry, `try_take` returns
immediately — stmx `take`/`try-take` semantics, primitives.lisp:164-184).

Protocol parity (primitives.lisp:12-43): `full_p`, `empty_p`,
`empty_`, `peek`, `take`, `put`, `try_take`, `try_put`; cons `car`/
`cdr` accessors (:188-204); list `push`/`pop` (:210-216); key-value
`entry_count`, `get_value(key, default)`, `set_value`, `rem_value`,
`container_keys/values/pairs`, `map_container`, `copy_container`
(:222-...). The sorted map takes an explicit comparator predicate
(strict less-than) exactly like transactional-map's :predicate
(primitives.lisp:96-101, 137-143); keys/pairs iterate in predicate
order. The multicast channel broadcasts each put to every port
connected at that moment; a port connected later sees only later
messages (stmx tchannel/tport semantics, primitives.lisp:84-91,
122-127).
"""

from __future__ import annotations

import threading
from collections import deque
from typing import Any, Callable, Iterable


class _Base:
    """Shared lock + blocking-take machinery for every container."""

    def __init__(self) -> None:
        self._lock = threading.RLock()
        self._nonempty = threading.Condition(self._lock)

    # -- generic protocol (primitives.lisp:148-160) --
    def full_p(self) -> bool:
        return False  # unbounded, like the stmx defaults

    def empty_p(self) -> bool:
        with self._lock:
            return self._size() == 0

    def empty_(self) -> None:
        with self._lock:
            self._clear()

    # subclasses implement:
    def _size(self) -> int:  # pragma: no cover - abstract
        raise NotImplementedError

    def _clear(self) -> None:  # pragma: no cover - abstract
        raise NotImplementedError


class _Ordered(_Base):
    """peek/take/put protocol over an internal deque-like store."""

    _MISSING = object()

    def _pop_one(self) -> Any:  # pragma: no cover - abstract
        raise NotImplementedError

    def _peek_one(self) -> Any:  # pragma: no cover - abstract
        raise NotImplementedError

    def _push_one(self, value: Any) -> None:  # pragma: no cover - abstract
        raise NotImplementedError

    def peek(self, default: Any = None) -> Any:
        with self._lock:
            return default if self._size() == 0 else self._peek_one()

    def put(self, value: Any) -> Any:
        with self._nonempty:
            self._push_one(value)
            self._nonempty.notify()
        return value

    def try_put(self, value: Any) -> bool:
        self.put(value)  # unbounded: always succeeds
        return True

    def take(self, timeout: float | None = None) -> Any:
        """Blocking pop — the STM retry analog (primitives.lisp:168-170)."""
        with self._nonempty:
            if not self._nonempty.wait_for(lambda: self._size() > 0, timeout):
                raise TimeoutError("take on empty container timed out")
            return self._pop_one()

    def try_take(self) -> tuple[Any, bool]:
        with self._lock:
            if self._size() == 0:
                return None, False
            return self._pop_one(), True


class Cell(_Ordered):
    """Single-value cell (transactional-cell, primitives.lisp:64-66)."""

    def __init__(self, initial_value: Any = _Ordered._MISSING) -> None:
        super().__init__()
        self._v = initial_value

    def _size(self) -> int:
        return 0 if self._v is self._MISSING else 1

    def _clear(self) -> None:
        self._v = self._MISSING

    def _peek_one(self) -> Any:
        return self._v

    def _pop_one(self) -> Any:
        v, self._v = self._v, self._MISSING
        return v

    def _push_one(self, value: Any) -> None:
        self._v = value  # put on a full cell overwrites (tcell value slot)


class Cons(_Base):
    """Mutable pair (transactional-cons, primitives.lisp:68-70,188-204)."""

    def __init__(self, car: Any = None, cdr: Any = None) -> None:
        super().__init__()
        self._car, self._cdr = car, cdr

    def _size(self) -> int:
        return int(self._car is not None or self._cdr is not None)

    def _clear(self) -> None:
        self._car = self._cdr = None

    @property
    def car(self) -> Any:
        with self._lock:
            return self._car

    @car.setter
    def car(self, v: Any) -> None:
        with self._lock:
            self._car = v

    @property
    def cdr(self) -> Any:
        with self._lock:
            return self._cdr

    @cdr.setter
    def cdr(self, v: Any) -> None:
        with self._lock:
            self._cdr = v


class TList(_Ordered):
    """LIFO list with push/pop (transactional-list, primitives.lisp:
    72-74, 210-216). peek/take operate on the head like tpop."""

    def __init__(self, initial_data: Iterable[Any] = ()) -> None:
        super().__init__()
        self._d: deque[Any] = deque(initial_data)

    def _size(self) -> int:
        return len(self._d)

    def _clear(self) -> None:
        self._d.clear()

    def _peek_one(self) -> Any:
        return self._d[0]

    def _pop_one(self) -> Any:
        return self._d.popleft()

    def _push_one(self, value: Any) -> None:
        self._d.appendleft(value)

    push = _Ordered.put  # tpush
    pop = _Ordered.take  # tpop (blocking flavor)

    def to_list(self) -> list[Any]:
        with self._lock:
            return list(self._d)


class FifoQueue(_Ordered):
    """FIFO queue (transactional-fifo-queue, primitives.lisp:80-82)."""

    def __init__(self) -> None:
        super().__init__()
        self._d: deque[Any] = deque()

    def _size(self) -> int:
        return len(self._d)

    def _clear(self) -> None:
        self._d.clear()

    def _peek_one(self) -> Any:
        return self._d[0]

    def _pop_one(self) -> Any:
        return self._d.popleft()

    def _push_one(self, value: Any) -> None:
        self._d.append(value)


class FiloQueue(FifoQueue):
    """LIFO stack (transactional-filo-queue, primitives.lisp:76-78)."""

    def _peek_one(self) -> Any:
        return self._d[-1]

    def _pop_one(self) -> Any:
        return self._d.pop()


class HashTable(_Base):
    """Key-value store (transactional-hash-table, primitives.lisp:
    92-94, 222-...). `test` must be supplied, mirroring the reference's
    mandatory :test (it errors without one, primitives.lisp:129-131);
    only equality-by-value (`==`, Python's dict semantics) is supported.
    """

    def __init__(self, test: str = "equal") -> None:
        super().__init__()
        if test not in ("eq", "eql", "equal", "equalp"):
            raise ValueError(f"unsupported test function: {test}")
        self._m: dict[Any, Any] = {}

    def _size(self) -> int:
        return len(self._m)

    def _clear(self) -> None:
        self._m.clear()

    def entry_count(self) -> int:
        with self._lock:
            return len(self._m)

    def get_value(self, key: Any, default: Any = None) -> Any:
        with self._lock:
            return self._m.get(key, default)

    def set_value(self, key: Any, value: Any) -> Any:
        with self._lock:
            self._m[key] = value
        return value

    def rem_value(self, key: Any) -> bool:
        with self._lock:
            return self._m.pop(key, _Ordered._MISSING) is not _Ordered._MISSING

    def container_keys(self) -> list[Any]:
        with self._lock:
            return list(self._m.keys())

    def container_values(self) -> list[Any]:
        with self._lock:
            return list(self._m.values())

    def container_pairs(self) -> list[tuple[Any, Any]]:
        with self._lock:
            return list(self._m.items())

    def map_container(self, fn: Callable[[Any, Any], Any]) -> None:
        with self._lock:
            for k, v in list(self._m.items()):
                fn(k, v)

    def copy_container(self) -> "HashTable":
        out = type(self).__new__(type(self))
        _Base.__init__(out)
        with self._lock:
            out._m = dict(self._m)
            if hasattr(self, "_pred"):
                out._pred = self._pred  # type: ignore[attr-defined]
                out._keys = list(self._keys)  # type: ignore[attr-defined]
        return out


class SortedMap(HashTable):
    """Comparator-ordered map (transactional-map, primitives.lisp:
    96-101, 137-143): the predicate is MANDATORY, a strict less-than,
    and controls the order of container_keys/values/pairs and
    first/last — exactly the :predicate contract (default fixnum< in
    the reference; no default here to keep the error behavior)."""

    def __init__(self, predicate: Callable[[Any, Any], bool]) -> None:
        if predicate is None:
            raise ValueError("predicate must be supplied for map to work")
        super().__init__()
        self._pred = predicate
        self._keys: list[Any] = []  # maintained in predicate order

    def _clear(self) -> None:
        super()._clear()
        self._keys.clear()

    def _locate(self, key: Any) -> int:
        lo, hi = 0, len(self._keys)
        while lo < hi:  # binary search with a comparator predicate
            mid = (lo + hi) // 2
            if self._pred(self._keys[mid], key):
                lo = mid + 1
            else:
                hi = mid
        return lo

    def set_value(self, key: Any, value: Any) -> Any:
        with self._lock:
            if key not in self._m:
                self._keys.insert(self._locate(key), key)
            self._m[key] = value
        return value

    def rem_value(self, key: Any) -> bool:
        with self._lock:
            if key in self._m:
                i = self._locate(key)
                # keys comparing equal under the predicate cluster here
                while self._keys[i] != key:
                    i += 1
                del self._keys[i]
                del self._m[key]
                return True
            return False

    def container_keys(self) -> list[Any]:
        with self._lock:
            return list(self._keys)

    def container_values(self) -> list[Any]:
        with self._lock:
            return [self._m[k] for k in self._keys]

    def container_pairs(self) -> list[tuple[Any, Any]]:
        with self._lock:
            return [(k, self._m[k]) for k in self._keys]

    def map_container(self, fn: Callable[[Any, Any], Any]) -> None:
        with self._lock:
            for k, v in self.container_pairs():
                fn(k, v)

    def first_pair(self) -> tuple[Any, Any] | None:
        with self._lock:
            return (self._keys[0], self._m[self._keys[0]]) if self._keys else None

    def last_pair(self) -> tuple[Any, Any] | None:
        with self._lock:
            return (self._keys[-1], self._m[self._keys[-1]]) if self._keys else None


class MulticastChannel(_Base):
    """Broadcast channel (transactional-channel, primitives.lisp:84-86):
    every value put is delivered to EVERY port connected at that moment;
    ports read independently at their own pace, and a port connected
    later sees only later messages (tchannel/tport semantics)."""

    def __init__(self) -> None:
        super().__init__()
        self._ports: list["MulticastPort"] = []

    def _size(self) -> int:
        return len(self._ports)

    def _clear(self) -> None:
        self._ports.clear()

    def connect(self) -> "MulticastPort":
        port = MulticastPort(self)
        with self._lock:
            self._ports.append(port)
        return port

    def put(self, value: Any) -> Any:
        with self._lock:
            ports = list(self._ports)
        for p in ports:
            p._deliver(value)
        return value


class MulticastPort(FifoQueue):
    """Reader endpoint (transactional-port, primitives.lisp:88-91,
    122-127): cannot exist without a channel — construct via
    `MulticastChannel.connect()`."""

    def __init__(self, channel: MulticastChannel | None = None) -> None:
        if channel is None:
            raise ValueError("Port cannot exist without linked channel")
        super().__init__()
        self._channel = channel

    def _deliver(self, value: Any) -> None:
        super().put(value)

    def put(self, value: Any) -> Any:
        raise TypeError("ports are read-only; put on the channel instead")
