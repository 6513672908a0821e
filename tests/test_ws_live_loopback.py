"""Live websocket path, exercised end-to-end WITHOUT external network:
an in-process RFC 6455 loopback SERVER feeds Binance-shaped trade
frames to the engine's dependency-free client
(sources/ws_client.py -> websocket.start_spool_raw), frames land in
the spool, and the spool parses through the exact replay+parse
pipeline the reference's socket loop feeds (base.py:47-60).

Covers: upgrade handshake (key/accept verification), 7- and 16-bit
payload lengths, ping->pong keepalive, fragmented text reassembly,
clean close, and spool->parse integration."""

from __future__ import annotations

import json
import socket
import threading
import time

from binance_etl_spark.sources import ws_client as W


class LoopbackWsServer:
    """One-shot websocket server: handshake, scripted frames, close.

    Records the client's pong payloads for assertion."""

    def __init__(self, script):
        self.script = script  # list of ("text"|"frag"|"ping", payload)
        self.pongs: list[bytes] = []
        self.srv = socket.socket()
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(1)
        self.port = self.srv.getsockname()[1]
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self) -> None:
        conn, _ = self.srv.accept()
        conn.settimeout(20)
        req = bytearray()
        while b"\r\n\r\n" not in req:
            req.extend(conn.recv(4096))
        head = req.decode("latin-1")
        key = next(
            line.split(":", 1)[1].strip()
            for line in head.split("\r\n")
            if line.lower().startswith("sec-websocket-key:")
        )
        conn.sendall(
            (
                "HTTP/1.1 101 Switching Protocols\r\n"
                "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                f"Sec-WebSocket-Accept: {W.accept_key(key)}\r\n\r\n"
            ).encode()
        )
        rf = conn.makefile("rb")
        for kind, payload in self.script:
            if kind == "text":
                conn.sendall(W.encode_frame(W.OP_TEXT, payload.encode(), mask=False))
            elif kind == "frag":
                # split a text message across TEXT(fin=0) + CONT(fin=1)
                data = payload.encode()
                half = len(data) // 2
                f1 = bytearray(W.encode_frame(W.OP_TEXT, data[:half], mask=False))
                f1[0] &= 0x7F  # clear FIN
                conn.sendall(bytes(f1))
                conn.sendall(W.encode_frame(W.OP_CONT, data[half:], mask=False))
            elif kind == "wait":
                payload.wait(timeout=20)  # a threading.Event from the test
            elif kind == "ping":
                conn.sendall(W.encode_frame(W.OP_PING, payload, mask=False))
                op, _, pong = W.read_frame(rf)
                assert op == W.OP_PONG
                self.pongs.append(pong)
        conn.sendall(W.encode_frame(W.OP_CLOSE, b"", mask=False))
        # client echoes close (RFC 6455 §5.5.1)
        op, _, _ = W.read_frame(rf)
        assert op == W.OP_CLOSE
        conn.close()
        self.srv.close()


def _trade_frame(i: int, pad: str = "") -> str:
    return json.dumps(
        {
            "e": "trade",
            "E": 1_727_000_000_000 + i,
            "s": "BNBUSDT",
            "t": 100 + i,
            "p": f"{598 + i}.00000000",
            "q": "1.00000000",
            "m": i % 2 == 0,
            "pad": pad,
        },
        separators=(",", ":"),
    )


def test_socket_to_spool_to_parse_end_to_end(spark, tmp_path):
    big = _trade_frame(2, pad="x" * 300)  # forces the 16-bit length path
    script = [
        ("text", _trade_frame(0)),
        ("ping", b"keepalive"),
        ("text", _trade_frame(1)),
        ("frag", big),
        ("text", '{"e":"depthUpdate","E":1,"s":"BNBUSDT"}'),  # non-trade frame
        ("text", "this is not json"),  # corrupt frame must drop, not crash
        ("text", _trade_frame(3)),
    ]
    server = LoopbackWsServer(script)

    from binance_etl_spark.sources.websocket import start_spool_raw

    spool = str(tmp_path / "live_spool.jsonl")
    stop = start_spool_raw("127.0.0.1", server.port, "/ws/bnbusdt@trade", spool)
    deadline = time.time() + 20
    while time.time() < deadline:
        try:
            if sum(1 for _ in open(spool)) >= 6:
                break
        except FileNotFoundError:
            pass
        time.sleep(0.05)
    stop()
    server.thread.join(timeout=10)

    assert server.pongs == [b"keepalive"], "client must answer pings"

    # spool is a replay log: parse through the standard pipeline
    from binance_etl_spark.sources.replay import read_replay
    from binance_etl_spark.streaming.parse import parse_trades

    frames = read_replay(spark, spool)
    assert frames.count() == 6, "every text message spooled once, in order"
    seqs = [r["seq"] for r in frames.orderBy("seq").collect()]
    assert seqs == list(range(6))

    trades = parse_trades(frames).orderBy("id").collect()
    assert [r["id"] for r in trades] == [100, 101, 102, 103]
    assert trades[2]["price"] is not None  # the fragmented 16-bit frame parsed
    sides = {r["id"]: r["side"] for r in trades}
    assert sides[100] == "sell" and sides[101] == "buy"


def test_live_spool_streams_while_growing(spark, tmp_path):
    """The full reference loop as a STREAMING query: the websocket
    client is still draining frames into the spool while Structured
    Streaming micro-batches consume it. Proves (a) the spool is a real
    unbounded source — offsets advance as the file grows — and (b) the
    maxFramesPerBatch admission cap paces every batch after the first
    (first-batch catch-up is inherent: the engine picks the first end
    offset before revealing checkpoint state, see replay.latestOffset)."""
    gate = threading.Event()
    first = [("text", _trade_frame(i)) for i in range(3)]
    second = [("text", _trade_frame(i)) for i in range(3, 6)]
    server = LoopbackWsServer(first + [("wait", gate)] + second)

    from binance_etl_spark.sources.websocket import start_spool_raw, stream_live
    from binance_etl_spark.streaming.parse import parse_trades

    spool = str(tmp_path / "live_grow.jsonl")
    stop = start_spool_raw("127.0.0.1", server.port, "/ws", spool)
    deadline = time.time() + 20
    while time.time() < deadline:  # first 3 frames spooled
        try:
            if sum(1 for _ in open(spool)) >= 3:
                break
        except FileNotFoundError:
            pass
        time.sleep(0.05)

    trades = parse_trades(stream_live(spark, spool, max_frames_per_batch=2))
    q = (
        trades.writeStream.format("memory")
        .queryName("live_ws_mem")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1: catch-up over the first 3
        n1 = spark.sql("SELECT count(*) AS n FROM live_ws_mem").first()["n"]
        assert n1 == 3, "first batch catches up to the live log head"

        gate.set()  # the socket delivers 3 more frames WHILE running
        deadline = time.time() + 30
        while time.time() < deadline:
            q.processAllAvailable()
            n = spark.sql("SELECT count(*) AS n FROM live_ws_mem").first()["n"]
            if n >= 6:
                break
            time.sleep(0.1)
        rows = spark.sql("SELECT id, symbol FROM live_ws_mem ORDER BY id").collect()
        assert [r["id"] for r in rows] == [100 + i for i in range(6)]
        assert {r["symbol"] for r in rows} == {"BNBUSDT"}
        # admission control: every batch after the catch-up respects
        # the 2-frame cap (and nothing is ever double-served)
        nonempty = [p["numInputRows"] for p in q.recentProgress if p["numInputRows"] > 0]
        assert nonempty[0] == 3
        assert all(n <= 2 for n in nonempty[1:]), nonempty
        assert sum(nonempty) == 6, "no frame lost, none double-served"
    finally:
        q.stop()
        stop()
    server.thread.join(timeout=10)
