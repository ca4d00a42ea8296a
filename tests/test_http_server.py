"""AsyncHTTPServer protocol tests: keep-alive, sequential requests on one
connection, HTTP/1.0 close behaviour, malformed requests, 405, and
concurrent clients. Complements tests/test_serving.py (endpoint logic)."""

import socket
import threading

import pytest

from sparrowrecsys_tpu.serving.http import AsyncHTTPServer


def _handler(path, q):
    if path == "/echo":
        return 200, "text/plain", f"echo:{q('x')}".encode()
    if path == "/boom":
        raise RuntimeError("handler crash")
    return 404, "text/plain", b"nope"


@pytest.fixture(scope="module")
def server():
    srv = AsyncHTTPServer(_handler, port=0, workers=4)
    srv.start()
    yield srv
    srv.stop()


def _connect(srv):
    s = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
    s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    return s


def _request(sock, target, version="HTTP/1.1", headers=""):
    sock.sendall(f"GET {target} {version}\r\nHost: t\r\n{headers}\r\n".encode())
    return _read_response(sock)


def _read_response(sock):
    buf = b""
    while b"\r\n\r\n" not in buf:
        chunk = sock.recv(65536)
        if not chunk:
            return None, buf
        buf += chunk
    head, _, body = buf.partition(b"\r\n\r\n")
    length = 0
    for line in head.split(b"\r\n"):
        if line.lower().startswith(b"content-length:"):
            length = int(line.split(b":")[1])
    while len(body) < length:
        body += sock.recv(65536)
    return head, body[:length]


def test_keep_alive_sequential_requests(server):
    s = _connect(server)
    try:
        for i in range(5):
            head, body = _request(s, f"/echo?x={i}")
            assert b"200" in head.split(b"\r\n")[0]
            assert body == f"echo:{i}".encode()
            assert b"keep-alive" in head.lower()
    finally:
        s.close()


def test_http10_closes_connection(server):
    s = _connect(server)
    try:
        head, body = _request(s, "/echo?x=a", version="HTTP/1.0")
        assert body == b"echo:a"
        assert b"connection: close" in head.lower()
        assert s.recv(1) == b""  # server closed
    finally:
        s.close()


def test_connection_close_header_honored(server):
    s = _connect(server)
    try:
        head, body = _request(s, "/echo?x=z", headers="Connection: close\r\n")
        assert body == b"echo:z"
        assert s.recv(1) == b""
    finally:
        s.close()


def test_post_rejected_405(server):
    s = _connect(server)
    try:
        s.sendall(b"POST /echo HTTP/1.1\r\nHost: t\r\nContent-Length: 0\r\n\r\n")
        head, body = _read_response(s)
        assert b"405" in head.split(b"\r\n")[0]
    finally:
        s.close()


def test_handler_exception_returns_500(server):
    s = _connect(server)
    try:
        head, body = _request(s, "/boom")
        assert b"500" in head.split(b"\r\n")[0]
        # connection stays usable (keep-alive survives handler crashes)
        head2, body2 = _request(s, "/echo?x=ok")
        assert body2 == b"echo:ok"
    finally:
        s.close()


def test_missing_route_404(server):
    s = _connect(server)
    try:
        head, body = _request(s, "/nothing")
        assert b"404" in head.split(b"\r\n")[0]
    finally:
        s.close()


def test_garbage_request_closes_cleanly(server):
    s = _connect(server)
    try:
        s.sendall(b"NONSENSE\r\n\r\n")
        assert s.recv(65536) == b""  # closed without a crash
    finally:
        s.close()
    # server still alive for the next client
    s2 = _connect(server)
    try:
        _, body = _request(s2, "/echo?x=alive")
        assert body == b"echo:alive"
    finally:
        s2.close()


def test_concurrent_clients(server):
    results = []

    def client(i):
        s = _connect(server)
        try:
            for j in range(10):
                _, body = _request(s, f"/echo?x={i}.{j}")
                assert body == f"echo:{i}.{j}".encode()
            results.append(i)
        finally:
            s.close()

    threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(results) == list(range(8))


def test_blocking_start_exposes_bound_port():
    """start(block=True) must still record the OS-assigned port (it binds
    on the loop thread first, then joins) — with PORT=0 the old inline
    run_loop made the port unknowable."""
    srv = AsyncHTTPServer(_handler, port=0, workers=2)
    t = threading.Thread(target=srv.start, kwargs={"block": True}, daemon=True)
    t.start()
    assert srv._ready.wait(timeout=10)
    assert srv.port != 0
    s = _connect(srv)
    try:
        head, body = _request(s, "/echo?x=1")
        assert b"200" in head.split(b"\r\n")[0] and body == b"echo:1"
    finally:
        s.close()
        srv.stop()
        t.join(timeout=5)


def test_client_disconnect_mid_response_is_quiet(server):
    """A peer that vanishes right after sending a request (load generators
    at their deadline) must not leave an unretrieved-exception traceback —
    the connection task swallows the dead-socket write."""
    for _ in range(8):
        s = _connect(server)
        s.sendall(b"GET /echo?x=1 HTTP/1.1\r\nHost: t\r\n\r\n")
        s.setsockopt(socket.SOL_SOCKET, socket.SO_LINGER,
                     b"\x01\x00\x00\x00\x00\x00\x00\x00")  # RST on close
        s.close()
    # server must still serve afterwards
    s = _connect(server)
    try:
        head, body = _request(s, "/echo?x=2")
        assert body == b"echo:2"
    finally:
        s.close()


def test_admission_control_sheds_503_beyond_max_inflight():
    """With max_inflight=2, concurrent slow requests beyond 2 in flight
    get an immediate 503; the connection stays usable; shed_count tracks."""
    import time as _time

    ev = threading.Event()

    def slow_handler(path, q):
        if path == "/slow":
            ev.wait(5)
            return 200, "text/plain", b"done"
        return 200, "text/plain", b"ok"

    srv = AsyncHTTPServer(slow_handler, port=0, workers=8, max_inflight=2)
    srv.start()
    try:
        socks = [_connect(srv) for _ in range(4)]
        for s in socks:
            s.sendall(b"GET /slow HTTP/1.1\r\nHost: t\r\n\r\n")
        _time.sleep(0.5)  # first two occupy the pool; rest must shed
        # The shed responses arrive while /slow still blocks.
        shed_heads = []
        for s in socks[2:]:
            head, body = _read_response(s)
            shed_heads.append((head, body))
        for head, body in shed_heads:
            assert b"503" in head.split(b"\r\n")[0]
            assert body == b"overloaded"
        assert srv.shed_count == 2
        ev.set()  # release the in-flight pair
        for s in socks[:2]:
            head, body = _read_response(s)
            assert b"200" in head.split(b"\r\n")[0]
            assert body == b"done"
        # Shed connections remain keep-alive usable afterwards.
        head, body = _request(socks[2], "/fast")
        assert b"200" in head.split(b"\r\n")[0]
        for s in socks:
            s.close()
    finally:
        srv.stop()


def test_latency_stats_per_endpoint(server):
    """The server records per-endpoint latency rings (queue wait included)
    and latency_stats() reports sliding-window quantiles (VERDICT r4 #9)."""
    s = _connect(server)
    try:
        for i in range(10):
            head, body = _request(s, f"/echo?x={i}")
            assert b"200" in head
        head, _ = _request(s, "/static/anything.css")
        assert head is not None
    finally:
        s.close()
    stats = server.latency_stats()
    # /echo is not an API endpoint -> grouped under "static" (bounded
    # cardinality); API paths (/get*, /metrics) keep their own ring.
    assert "static" in stats
    row = stats["static"]
    assert row["count"] >= 11 and row["window"] >= 11
    assert 0.0 <= row["p50_ms"] <= row["p90_ms"] <= row["p99_ms"] < 5000.0
    server._record_latency("/getmovie", 3.0)
    server._record_latency("/getmovie", 5.0)
    got = server.latency_stats()["/getmovie"]
    assert got["count"] == 2 and 3.0 <= got["p50_ms"] <= 5.0


def test_default_admission_control_bounded():
    """ServingConfig ships with a measured non-zero max_inflight default
    (VERDICT r4 #8) — the asyncio facade has no implicit bound, unlike the
    reference's Jetty pool; 0 stays available as the opt-out."""
    from sparrowrecsys_tpu.config import ServingConfig

    cfg = ServingConfig()
    assert cfg.max_inflight == 32
    assert ServingConfig(max_inflight=0).max_inflight == 0
