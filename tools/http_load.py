"""Out-of-process HTTP load generator (keep-alive, multi-process).

The round-1 serving bench drove load from threads inside the server
process — GIL-shared with the handlers, understating the server. This
generator lives in its own process tree: N worker processes, each with C
persistent keep-alive connections driven round-robin.

    python tools/http_load.py --url "http://127.0.0.1:6010/getrecforyou?id=1&size=32&model=emb" \
        --procs 4 --conns 8 --seconds 5 [--ids 1,2,...]

Prints one JSON line: {"requests": N, "seconds": S, "rps": R, "errors": E,
"p50_ms": ..., "p90_ms": ..., "p99_ms": ...} (per-request latency from a
connection's send to its parsed response).
`--ids` substitutes {id} in the url template per request (round-robin) so
caches don't trivially serve one hot user.

Two load models:

- CLOSED-LOOP (default): each connection sends its next request only after
  the previous response arrives. Throughput self-limits to the server's
  capacity; it can never show saturation behavior (BASELINE.md wave-ceiling
  negative is closed-loop by construction).
- OPEN-LOOP (`--rate R`, VERDICT r3 #4): requests fire at a constant
  arrival rate regardless of responses (sleep-paced asyncio senders, the
  connection pool grows when the server falls behind). Latency is measured
  from the SCHEDULED send time, so queueing delay is charged to the server
  (no coordinated omission). Sweeping `--rate` past capacity traces the
  real throughput/latency knee — production traffic is open-loop.
"""

from __future__ import annotations

import argparse
import itertools
import json
import multiprocessing as mp
import socket
import time
from urllib.parse import urlparse


def worker(url_templates, conns, seconds, out_q):
    parsed = urlparse(url_templates[0])
    host, port = parsed.hostname, parsed.port or 80
    socks = []
    for _ in range(conns):
        s = socket.create_connection((host, port), timeout=10)
        s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        socks.append(s)
    paths = itertools.cycle(
        [u[u.index(parsed.path):] if parsed.path in u else u for u in url_templates]
    )
    n = errors = 0
    bufs = [b""] * conns
    sent_at = [0.0] * conns
    lats: list = []
    deadline = time.perf_counter() + seconds
    try:
        while time.perf_counter() < deadline:
            # pipeline one request per connection, then collect responses
            for i, s in enumerate(socks):
                path = next(paths)
                req = (
                    f"GET {path} HTTP/1.1\r\nHost: {host}\r\n"
                    "Connection: keep-alive\r\n\r\n"
                ).encode()
                sent_at[i] = time.perf_counter()
                s.sendall(req)
            for i, s in enumerate(socks):
                try:
                    body_len = None
                    buf = bufs[i]
                    while True:
                        if b"\r\n\r\n" in buf and body_len is None:
                            head, _, buf = buf.partition(b"\r\n\r\n")
                            body_len = 0
                            for line in head.split(b"\r\n"):
                                if line.lower().startswith(b"content-length:"):
                                    body_len = int(line.split(b":")[1])
                        if body_len is not None and len(buf) >= body_len:
                            buf = buf[body_len:]
                            break
                        chunk = s.recv(65536)
                        if not chunk:
                            raise ConnectionError("closed")
                        buf += chunk
                    bufs[i] = buf
                    n += 1
                    lats.append(time.perf_counter() - sent_at[i])
                except Exception:
                    errors += 1
                    try:
                        s.close()
                    except Exception:
                        pass
                    s = socket.create_connection((host, port), timeout=10)
                    s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                    socks[i] = s
                    bufs[i] = b""
    finally:
        for s in socks:
            try:
                s.close()
            except Exception:
                pass
    out_q.put((n, errors, lats))


def open_loop_worker(url_templates, rate, seconds, out_q):
    """Constant-arrival-rate sender: one asyncio loop, request k fires at
    t0 + k/rate whatever the server is doing. Keep-alive connections are
    pooled; the pool grows when responses lag arrivals (the open-loop
    property closed-loop load cannot have)."""
    import asyncio

    parsed = urlparse(url_templates[0])
    host, port = parsed.hostname, parsed.port or 80
    paths = itertools.cycle(
        [u[u.index(parsed.path):] if parsed.path in u else u for u in url_templates]
    )

    async def read_response(reader):
        head = await reader.readuntil(b"\r\n\r\n")
        status = int(head.split(b" ", 2)[1])
        body_len = 0
        for line in head.split(b"\r\n"):
            if line.lower().startswith(b"content-length:"):
                body_len = int(line.split(b":")[1])
        if body_len:
            await reader.readexactly(body_len)
        return status

    async def main():
        pool: list = []  # free (reader, writer) pairs
        lats: list = []
        stats = {"done": 0, "errors": 0, "conns": 0, "shed": 0}

        async def one(path, t_sched):
            try:
                if pool:
                    reader, writer = pool.pop()
                else:
                    reader, writer = await asyncio.open_connection(host, port)
                    stats["conns"] += 1
                writer.write(
                    (f"GET {path} HTTP/1.1\r\nHost: {host}\r\n"
                     "Connection: keep-alive\r\n\r\n").encode()
                )
                await writer.drain()
                status = await read_response(reader)
                if status == 503:  # admission control shed this request
                    stats["shed"] += 1
                else:
                    # Latency from the SCHEDULED time: server queueing
                    # delay counts (coordinated-omission-free).
                    lats.append(time.perf_counter() - t_sched)
                    stats["done"] += 1
                pool.append((reader, writer))
            except Exception:
                stats["errors"] += 1

        loop = asyncio.get_event_loop()
        n_req = int(rate * seconds)
        t0 = time.perf_counter()
        tasks = []
        for k in range(n_req):
            t_sched = t0 + k / rate
            delay = t_sched - time.perf_counter()
            if delay > 0:
                await asyncio.sleep(delay)
            tasks.append(asyncio.ensure_future(one(next(paths), t_sched)))
        # Drain window: outstanding requests get 30 s, then count as errors.
        done, pending = await asyncio.wait(tasks, timeout=30)
        for t in pending:
            t.cancel()
            stats["errors"] += 1
        elapsed = time.perf_counter() - t0
        for reader, writer in pool:
            try:
                writer.close()
            except Exception:
                pass
        out_q.put((stats["done"], stats["errors"], lats, elapsed,
                   stats["conns"], stats["shed"]))

    asyncio.run(main())


def run_open_loop(
    url: str, rate: float, seconds: float, procs: int = 4, ids=None
) -> dict:
    """Offered `rate` req/s split over `procs` sender processes. Returns
    offered vs achieved rps + scheduled-time latency percentiles."""
    urls = [url.replace("{id}", str(i)) for i in ids] if ids else [url]
    q = mp.Queue()
    ps = [
        mp.Process(
            target=open_loop_worker, args=(urls, rate / procs, seconds, q)
        )
        for _ in range(procs)
    ]
    for p in ps:
        p.start()
    total = errors = conns = shed = 0
    lats: list = []
    elapsed = 0.0
    for _ in ps:
        n, e, l, el, c, sh = q.get()
        total += n
        errors += e
        conns += c
        shed += sh
        lats.extend(l)
        elapsed = max(elapsed, el)
    for p in ps:
        p.join()
    out = {
        "offered_rps": round(rate, 1),
        "achieved_rps": round(total / max(elapsed, 1e-9), 1),
        "requests": total,
        "errors": errors,
        "shed_503": shed,
        "connections": conns,
        "seconds": round(elapsed, 2),
    }
    if lats:
        lats.sort()

        def pct(p):
            return round(lats[min(len(lats) - 1, int(p * len(lats)))] * 1e3, 2)

        out.update({"p50_ms": pct(0.50), "p90_ms": pct(0.90), "p99_ms": pct(0.99)})
    return out


def run_load(url: str, procs: int, conns: int, seconds: float, ids=None) -> dict:
    if ids:
        urls = [url.replace("{id}", str(i)) for i in ids]
    else:
        urls = [url]
    q = mp.Queue()
    ps = [
        mp.Process(target=worker, args=(urls, conns, seconds, q))
        for _ in range(procs)
    ]
    t0 = time.perf_counter()
    for p in ps:
        p.start()
    total = errors = 0
    lats: list = []
    for _ in ps:
        n, e, l = q.get()
        total += n
        errors += e
        lats.extend(l)
    for p in ps:
        p.join()
    dt = time.perf_counter() - t0
    out = {
        "requests": total,
        "seconds": round(dt, 2),
        "rps": round(total / max(dt, 1e-9), 1),
        "errors": errors,
    }
    if lats:
        lats.sort()

        def pct(p):
            return round(lats[min(len(lats) - 1, int(p * len(lats)))] * 1e3, 2)

        out.update({"p50_ms": pct(0.50), "p90_ms": pct(0.90), "p99_ms": pct(0.99)})
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", required=True)
    ap.add_argument("--procs", type=int, default=4)
    ap.add_argument("--conns", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--ids", default=None, help="comma-separated {id} values")
    ap.add_argument(
        "--rate", type=float, default=None,
        help="open-loop mode: constant offered arrival rate (req/s total)",
    )
    args = ap.parse_args()
    ids = [int(x) for x in args.ids.split(",")] if args.ids else None
    if args.rate:
        print(json.dumps(
            run_open_loop(args.url, args.rate, args.seconds, args.procs, ids)
        ))
    else:
        print(json.dumps(
            run_load(args.url, args.procs, args.conns, args.seconds, ids)
        ))


if __name__ == "__main__":
    main()
