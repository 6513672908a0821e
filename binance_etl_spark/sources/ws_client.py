"""Minimal dependency-free websocket (RFC 6455) client.

The reference subscribes to Binance via binance-connector's websocket
client (reference base.py:26); this container has no such package and
no external network, so the engine carries its own ~150-line client
implementing the public RFC 6455 wire protocol: HTTP/1.1 upgrade
handshake with Sec-WebSocket-Key/Accept verification, client-side
frame masking (mandatory per RFC 6455 §5.3), 7/16/64-bit payload
lengths, fragmented text messages, ping->pong keepalive, and clean
close. `tests/test_ws_live_loopback.py` runs a full in-process
loopback server against it, so the socket->spool->stream path the
reference exercises against wss://stream.binance.com is exercised
end-to-end here without touching the network.

Scope: client side only, text messages (Binance frames are JSON
text), no extensions/compression. TLS is stdlib `ssl`: pass
``tls=True`` (or a ``wss://`` URL to `WebSocketClient.from_url`) and
the TCP socket is wrapped with ``ssl.create_default_context()`` —
full certificate + hostname verification against the system trust
store, matching the ``wss://stream.binance.com`` endpoint the
reference reaches through binance-connector (base.py:26). Tests
verify against a self-signed loopback CA via the ``ssl_context``
override (tests/test_ws_live_loopback.py TLS leg).
"""

from __future__ import annotations

import base64
import hashlib
import os
import socket
import struct

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"  # RFC 6455 §1.3

OP_CONT = 0x0
OP_TEXT = 0x1
OP_BINARY = 0x2
OP_CLOSE = 0x8
OP_PING = 0x9
OP_PONG = 0xA


def accept_key(sec_websocket_key: str) -> str:
    """Server-side accept token for a client key (RFC 6455 §4.2.2) —
    used by both the client's handshake verification and the loopback
    test server."""
    digest = hashlib.sha1((sec_websocket_key + _WS_GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def _read_exact(rf, n: int) -> bytes:
    """Read exactly n bytes from a buffered reader (socket.makefile)."""
    buf = rf.read(n)
    if buf is None or len(buf) < n:
        raise ConnectionError("websocket peer closed mid-frame")
    return buf


def encode_frame(opcode: int, payload: bytes, mask: bool) -> bytes:
    """One unfragmented frame. Clients MUST mask (RFC 6455 §5.3);
    servers MUST NOT — the flag serves both sides (the test server
    reuses this encoder)."""
    head = bytearray([0x80 | opcode])
    n = len(payload)
    mask_bit = 0x80 if mask else 0
    if n < 126:
        head.append(mask_bit | n)
    elif n < 1 << 16:
        head.append(mask_bit | 126)
        head.extend(struct.pack(">H", n))
    else:
        head.append(mask_bit | 127)
        head.extend(struct.pack(">Q", n))
    if mask:
        key = os.urandom(4)
        head.extend(key)
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return bytes(head) + payload


def read_frame(rf) -> tuple[int, bool, bytes]:
    """-> (opcode, fin, payload) from a buffered reader
    (socket.makefile("rb")). Unmasks if the peer masked. A buffered
    reader — NOT raw recv — is required so handshake reads and frame
    reads share one buffer and never discard over-read bytes."""
    b0, b1 = _read_exact(rf, 2)
    fin = bool(b0 & 0x80)
    opcode = b0 & 0x0F
    masked = bool(b1 & 0x80)
    n = b1 & 0x7F
    if n == 126:
        (n,) = struct.unpack(">H", _read_exact(rf, 2))
    elif n == 127:
        (n,) = struct.unpack(">Q", _read_exact(rf, 8))
    key = _read_exact(rf, 4) if masked else None
    payload = _read_exact(rf, n) if n else b""
    if key:
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return opcode, fin, payload


class WebSocketClient:
    """Blocking client: connect(), then iterate text_messages()."""

    def __init__(
        self,
        host: str,
        port: int,
        path: str = "/",
        timeout: float = 30.0,
        tls: bool = False,
        ssl_context=None,
    ):
        self.host, self.port, self.path = host, port, path
        self.sock = socket.create_connection((host, port), timeout=timeout)
        if tls:
            import ssl

            ctx = ssl_context or ssl.create_default_context()
            # server_hostname drives SNI + hostname verification (an IP
            # literal verifies against IPAddress SANs).
            self.sock = ctx.wrap_socket(self.sock, server_hostname=host)
        # One buffered reader for the connection's whole life: the 101
        # response and the first frames can arrive in one TCP segment,
        # so reading the handshake with raw recv() would silently
        # swallow the head of the frame stream.
        self._rf = self.sock.makefile("rb")
        self._handshake()

    @classmethod
    def from_url(cls, url: str, timeout: float = 30.0, ssl_context=None):
        """Connect from a ``ws://`` or ``wss://`` URL (default ports
        80/443); ``wss`` turns on TLS."""
        from urllib.parse import urlparse

        u = urlparse(url)
        if u.scheme not in ("ws", "wss"):
            raise ValueError(f"expected ws:// or wss:// URL, got {url!r}")
        tls = u.scheme == "wss"
        path = u.path or "/"
        if u.query:
            path = f"{path}?{u.query}"
        return cls(
            u.hostname,
            u.port or (443 if tls else 80),
            path,
            timeout=timeout,
            tls=tls,
            ssl_context=ssl_context,
        )

    def _handshake(self) -> None:
        key = base64.b64encode(os.urandom(16)).decode()
        req = (
            f"GET {self.path} HTTP/1.1\r\n"
            f"Host: {self.host}:{self.port}\r\n"
            "Upgrade: websocket\r\n"
            "Connection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Version: 13\r\n\r\n"
        )
        self.sock.sendall(req.encode())
        lines = []
        while True:
            line = self._rf.readline()
            if not line:
                raise ConnectionError("server closed during websocket handshake")
            if line in (b"\r\n", b"\n"):
                break
            lines.append(line.decode("latin-1").rstrip("\r\n"))
        status = lines[0] if lines else ""
        if " 101 " not in f"{status} ":
            raise ConnectionError(f"websocket upgrade refused: {status!r}")
        accept = next(
            (
                line.split(":", 1)[1].strip()
                for line in lines[1:]
                if line.lower().startswith("sec-websocket-accept:")
            ),
            None,
        )
        if accept != accept_key(key):
            raise ConnectionError("Sec-WebSocket-Accept mismatch (RFC 6455 §4.2.2)")

    def text_messages(self):
        """Yield complete text messages; answers pings; returns on
        close (echoing the close frame first, §5.5.1)."""
        fragments: list[bytes] = []
        while True:
            opcode, fin, payload = read_frame(self._rf)
            if opcode == OP_PING:
                self.sock.sendall(encode_frame(OP_PONG, payload, mask=True))
            elif opcode == OP_CLOSE:
                try:
                    self.sock.sendall(encode_frame(OP_CLOSE, payload[:2], mask=True))
                except OSError:
                    pass
                return
            elif opcode in (OP_TEXT, OP_CONT):
                fragments.append(payload)
                if fin:
                    yield b"".join(fragments).decode("utf-8")
                    fragments = []
            # binary/pong: ignored (Binance streams are text)

    def send_text(self, text: str) -> None:
        self.sock.sendall(encode_frame(OP_TEXT, text.encode("utf-8"), mask=True))

    def close(self) -> None:
        try:
            self.sock.sendall(encode_frame(OP_CLOSE, b"", mask=True))
        except OSError:
            pass
        try:
            self._rf.close()
        except OSError:
            pass
        self.sock.close()
