"""Dependency-free MongoDB wire-protocol client (BSON + OP_MSG).

The reference's real sink is ``mongoimport`` into a running mongod
(main.ipynb:1269-1270) followed by PyMongo queries.  The sandbox has
neither a mongod binary, PyMongo, nor the mongo-spark-connector jar,
so this module implements the PUBLIC protocol itself -- the BSON spec
(bsonspec.org) and the OP_MSG framing (MongoDB wire protocol docs,
opcode 2013) -- giving the engine a first-party Mongo sink that needs
no driver dependency at all:

* :func:`bson_encode` / :func:`bson_decode` -- the subset of BSON the
  engine's rows need: double, string, document, array, bool, null,
  int32/int64, UTC datetime, binary;
* :class:`MongoWireClient` -- a socket speaking OP_MSG command
  request/reply: ``hello``, ``insert``, ``find``/``getMore``,
  ``count``, ``drop``, ``dropDatabase``, ``ping``;
* used by sinks.write_mongodb_wire (executor-side foreachPartition
  inserts -- each partition its own connection, batched) and the e2e
  round-trip test against tools/fake_mongod.py, an in-repo TCP server
  speaking the same protocol (tests/test_mongo_wire.py).

Against a REAL mongod this client speaks the same bytes (OP_MSG has
been the only command protocol since MongoDB 5.1); auth/TLS are out of
scope -- parity sink, never the engine.
"""

from __future__ import annotations

import datetime as _dt
import socket
import struct
import threading

OP_MSG = 2013

_T_DOUBLE = 0x01
_T_STRING = 0x02
_T_DOC = 0x03
_T_ARRAY = 0x04
_T_BINARY = 0x05
_T_BOOL = 0x08
_T_DATETIME = 0x09
_T_NULL = 0x0A
_T_INT32 = 0x10
_T_INT64 = 0x12

_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


def _enc_cstring(s: str) -> bytes:
    b = s.encode("utf-8")
    if b"\x00" in b:
        raise ValueError("BSON key may not contain NUL")
    return b + b"\x00"


def _enc_element(key: str, v) -> bytes:
    k = _enc_cstring(key)
    if v is None:
        return bytes([_T_NULL]) + k
    if isinstance(v, bool):  # before int: bool is an int subclass
        return bytes([_T_BOOL]) + k + (b"\x01" if v else b"\x00")
    if isinstance(v, int):
        if -(2**31) <= v < 2**31:
            return bytes([_T_INT32]) + k + struct.pack("<i", v)
        return bytes([_T_INT64]) + k + struct.pack("<q", v)
    if isinstance(v, float):
        return bytes([_T_DOUBLE]) + k + struct.pack("<d", v)
    if isinstance(v, str):
        b = v.encode("utf-8")
        return bytes([_T_STRING]) + k + struct.pack("<i", len(b) + 1) + b + b"\x00"
    if isinstance(v, (_dt.datetime, _dt.date)):
        if not isinstance(v, _dt.datetime):
            v = _dt.datetime(v.year, v.month, v.day)
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        ms = int((v - _EPOCH).total_seconds() * 1000)
        return bytes([_T_DATETIME]) + k + struct.pack("<q", ms)
    if isinstance(v, (bytes, bytearray)):
        return (
            bytes([_T_BINARY])
            + k
            + struct.pack("<i", len(v))
            + b"\x00"  # generic subtype
            + bytes(v)
        )
    if isinstance(v, dict):
        return bytes([_T_DOC]) + k + bson_encode(v)
    if isinstance(v, (list, tuple)):
        return bytes([_T_ARRAY]) + k + bson_encode(
            {str(i): x for i, x in enumerate(v)}
        )
    raise TypeError(f"unsupported BSON type: {type(v).__name__}")


def bson_encode(doc: dict) -> bytes:
    body = b"".join(_enc_element(k, v) for k, v in doc.items())
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


def _dec_cstring(buf: bytes, at: int) -> tuple[str, int]:
    end = buf.index(b"\x00", at)
    return buf[at:end].decode("utf-8"), end + 1


def _dec_value(t: int, buf: bytes, at: int):
    if t == _T_NULL:
        return None, at
    if t == _T_BOOL:
        return buf[at] == 1, at + 1
    if t == _T_INT32:
        return struct.unpack_from("<i", buf, at)[0], at + 4
    if t == _T_INT64:
        return struct.unpack_from("<q", buf, at)[0], at + 8
    if t == _T_DOUBLE:
        return struct.unpack_from("<d", buf, at)[0], at + 8
    if t == _T_DATETIME:
        ms = struct.unpack_from("<q", buf, at)[0]
        return _EPOCH + _dt.timedelta(milliseconds=ms), at + 8
    if t == _T_STRING:
        n = struct.unpack_from("<i", buf, at)[0]
        return buf[at + 4 : at + 3 + n].decode("utf-8"), at + 4 + n
    if t == _T_BINARY:
        n = struct.unpack_from("<i", buf, at)[0]
        return bytes(buf[at + 5 : at + 5 + n]), at + 5 + n
    if t in (_T_DOC, _T_ARRAY):
        n = struct.unpack_from("<i", buf, at)[0]
        sub = bson_decode(buf[at : at + n])
        if t == _T_ARRAY:
            return [sub[str(i)] for i in range(len(sub))], at + n
        return sub, at + n
    raise TypeError(f"unsupported BSON type byte: 0x{t:02x}")


def bson_decode(buf: bytes) -> dict:
    (total,) = struct.unpack_from("<i", buf, 0)
    if total != len(buf):
        raise ValueError(f"BSON length mismatch: {total} != {len(buf)}")
    out: dict = {}
    at = 4
    while buf[at] != 0:
        t = buf[at]
        key, at = _dec_cstring(buf, at + 1)
        out[key], at = _dec_value(t, buf, at)
    return out


# --------------------------------------------------------------------
# OP_MSG framing


def frame_msg(doc: dict, request_id: int, response_to: int = 0) -> bytes:
    """One OP_MSG with flagBits=0 and a single kind-0 body section."""
    body = struct.pack("<I", 0) + b"\x00" + bson_encode(doc)
    return (
        struct.pack("<iiii", 16 + len(body), request_id, response_to, OP_MSG)
        + body
    )


def parse_msg(raw: bytes) -> tuple[int, int, dict]:
    """(request_id, response_to, body_doc) from one full wire message.
    Kind-1 document-sequence sections are folded into the body doc
    under their identifier, matching server-side command semantics."""
    _len, req_id, resp_to, opcode = struct.unpack_from("<iiii", raw, 0)
    if opcode != OP_MSG:
        raise ValueError(f"unsupported opcode {opcode} (only OP_MSG)")
    (flags,) = struct.unpack_from("<I", raw, 16)
    if flags & 0x1:  # checksumPresent
        raw = raw[:-4]
    at = 20
    body: dict = {}
    while at < len(raw):
        kind = raw[at]
        at += 1
        if kind == 0:
            (n,) = struct.unpack_from("<i", raw, at)
            body.update(bson_decode(raw[at : at + n]))
            at += n
        elif kind == 1:
            (sec_len,) = struct.unpack_from("<i", raw, at)
            end = at + sec_len
            ident, p = _dec_cstring(raw, at + 4)
            docs = []
            while p < end:
                (n,) = struct.unpack_from("<i", raw, p)
                docs.append(bson_decode(raw[p : p + n]))
                p += n
            body[ident] = docs
            at = end
        else:
            raise ValueError(f"unknown OP_MSG section kind {kind}")
    return req_id, resp_to, body


def read_exact(sock: socket.socket, n: int) -> bytes:
    chunks = []
    while n:
        c = sock.recv(n)
        if not c:
            raise ConnectionError("socket closed mid-message")
        chunks.append(c)
        n -= len(c)
    return b"".join(chunks)


def read_wire_message(sock: socket.socket) -> bytes:
    head = read_exact(sock, 4)
    (total,) = struct.unpack("<i", head)
    if not 16 <= total <= 48 * 1024 * 1024:  # mongod's own max message size
        raise ValueError(f"implausible message length {total}")
    return head + read_exact(sock, total - 4)


class MongoWireError(RuntimeError):
    pass


class MongoWireClient:
    """Minimal synchronous command client over one TCP connection.

    Not thread-safe (one in-flight request); each Spark partition task
    opens its own client, which is exactly the connection-per-task
    shape a connector's executor side has."""

    def __init__(self, host: str, port: int, timeout: float = 30.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._req_id = 0
        self._lock = threading.Lock()
        self.hello = self.command({"hello": 1, "$db": "admin"})

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def command(self, doc: dict) -> dict:
        with self._lock:
            self._req_id += 1
            self._sock.sendall(frame_msg(doc, self._req_id))
            _, resp_to, reply = parse_msg(read_wire_message(self._sock))
        if resp_to != self._req_id:
            raise MongoWireError(
                f"reply responseTo={resp_to} for request {self._req_id}"
            )
        if reply.get("ok") != 1:
            raise MongoWireError(
                f"command failed: {reply.get('errmsg', reply)}"
            )
        return reply

    # -- convenience commands ---------------------------------------

    def insert_many(self, db: str, coll: str, docs: list[dict]) -> int:
        if not docs:
            return 0
        r = self.command(
            {"insert": coll, "$db": db, "documents": list(docs)}
        )
        n = int(r.get("n", 0))
        if n != len(docs):
            raise MongoWireError(f"insert acked {n}/{len(docs)} documents")
        return n

    def count(self, db: str, coll: str) -> int:
        return int(self.command({"count": coll, "$db": db})["n"])

    def drop_collection(self, db: str, coll: str) -> None:
        try:
            self.command({"drop": coll, "$db": db})
        except MongoWireError as e:
            if "ns not found" not in str(e):
                raise

    def find_all(
        self, db: str, coll: str, filter: dict | None = None, batch_size: int = 1000
    ) -> list[dict]:
        r = self.command(
            {
                "find": coll,
                "$db": db,
                "filter": filter or {},
                "batchSize": batch_size,
            }
        )
        cur = r["cursor"]
        docs = list(cur["firstBatch"])
        while cur["id"]:
            r = self.command(
                {
                    "getMore": cur["id"],
                    "$db": db,
                    "collection": coll,
                    "batchSize": batch_size,
                }
            )
            cur = r["cursor"]
            docs.extend(cur["nextBatch"])
        return docs
