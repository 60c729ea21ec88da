"""DCN backend for GOP-parallel encoding: TCP worker pool.

The real multi-host executor behind `GopParallelEncoder` (SURVEY §2.8:
GOP distribution over DCN hosts; reference analogue: uvgComm scales by
running one kvazaar per stream on one host — we scale one stream across
hosts by closed-GOP segments).  Each worker host runs

    python -m kvazzup_tpu.pipeline.dcn --port 9555

and the driver side hands `DcnPool([(host, port), ...])` to
`GopParallelEncoder(executor=...)`.  Jobs ride a persistent TCP
connection per worker as length-framed pickles; the pool preserves job
order and RE-DISPATCHES jobs from a failed worker to the survivors (the
failure-detection/recovery analogue for the distributed axis — a lost
host degrades throughput, never correctness or completeness).

Trust model: pickle over TCP is remote code execution by design — this
is an intra-cluster DCN link between co-scheduled workers (the same
trust the reference places in its MPI/NCCL-class transports), NOT an
internet-facing protocol.  Bind to cluster-internal interfaces only.
"""

from __future__ import annotations

import argparse
import os
import pickle
import queue
import socket
import struct
import subprocess
import sys
import threading

_HDR = struct.Struct(">I")


def _send_msg(sock: socket.socket, obj) -> None:
    data = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    sock.sendall(_HDR.pack(len(data)) + data)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("DCN peer closed")
        buf.extend(chunk)
    return bytes(buf)


def _recv_msg(sock: socket.socket):
    (n,) = _HDR.unpack(_recv_exact(sock, _HDR.size))
    return pickle.loads(_recv_exact(sock, n))


# ---------------------------------------------------------------- worker


def serve(port: int = 0, host: str = "127.0.0.1", max_jobs: int = 0,
          announce=None) -> None:
    """Run a DCN worker: accept one driver connection at a time, execute
    (fn, arg) jobs until the driver disconnects.  `max_jobs` > 0 exits
    after that many jobs (test hook for failure-recovery coverage).
    `announce(port)` is called once the socket is listening."""
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(4)
    actual = srv.getsockname()[1]
    if announce is not None:
        announce(actual)
    else:
        print(f"DCN_WORKER_READY {actual}", flush=True)
    done = 0
    while True:
        conn, _ = srv.accept()
        conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        try:
            while True:
                fn, arg = _recv_msg(conn)
                try:
                    result = ("ok", fn(arg))
                except Exception as exc:  # job error ≠ worker death
                    result = ("err", f"{type(exc).__name__}: {exc}")
                _send_msg(conn, result)
                done += 1
                if max_jobs and done >= max_jobs:
                    conn.close()
                    srv.close()
                    return
        except (ConnectionError, OSError):
            conn.close()  # driver went away; await the next one


# ---------------------------------------------------------------- driver


class DcnJobError(RuntimeError):
    """A job raised on the worker (the worker itself stayed healthy)."""


class DcnPool:
    """Executor with `.map(fn, jobs)` over TCP workers.

    One dispatcher thread per worker pulls from a shared job queue, so
    fast workers take more segments (dynamic load balance across
    heterogeneous hosts).  A worker whose connection drops is retired
    and its in-flight job goes back on the queue; `map` fails only when
    every worker is gone with jobs still pending."""

    def __init__(self, addresses, connect_timeout: float = 10.0) -> None:
        if not addresses:
            raise ValueError("DcnPool needs at least one worker address")
        self.addresses = list(addresses)
        self.connect_timeout = connect_timeout

    def map(self, fn, jobs):
        jobs = list(jobs)
        results: list = [None] * len(jobs)
        errors: list = []
        pending: "queue.Queue" = queue.Queue()
        for idx, job in enumerate(jobs):
            pending.put((idx, job))
        addrs = list(self.addresses)
        while True:
            failed: list = []

            def run_worker(addr):
                sock = None
                current = None
                try:
                    sock = socket.create_connection(addr,
                                                    self.connect_timeout)
                    sock.settimeout(None)  # jobs may run for minutes
                    sock.setsockopt(socket.IPPROTO_TCP,
                                    socket.TCP_NODELAY, 1)
                    while True:
                        try:
                            current = pending.get_nowait()
                        except queue.Empty:
                            return
                        idx, job = current
                        _send_msg(sock, (fn, job))
                        status, payload = _recv_msg(sock)
                        if status == "ok":
                            results[idx] = payload
                        else:
                            errors.append(DcnJobError(payload))
                        current = None
                except (ConnectionError, OSError):
                    if current is not None:
                        pending.put(current)  # re-dispatch to survivors
                    failed.append(addr)
                finally:
                    if sock is not None:
                        sock.close()

            threads = [threading.Thread(target=run_worker, args=(a,),
                                        daemon=True) for a in addrs]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            if errors:
                raise errors[0]
            if pending.empty():
                return results
            addrs = [a for a in addrs if a not in failed]
            if not addrs:
                raise ConnectionError(
                    "all DCN workers lost with jobs still pending")


def spawn_local_workers(n: int, env_overrides=None, extra_args=()):
    """Launch `n` worker subprocesses on localhost ephemeral ports (CI /
    single-host harness for the DCN path).  Returns (procs, addresses);
    caller terminates the procs."""
    procs, addrs = [], []
    env = dict(os.environ)
    # the worker must import this package regardless of the caller's cwd
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
    if env_overrides:
        env.update(env_overrides)
    for _ in range(n):
        p = subprocess.Popen(
            [sys.executable, "-m", "kvazzup_tpu.pipeline.dcn", "--port", "0",
             *extra_args],
            stdout=subprocess.PIPE, env=env, text=True)
        line = p.stdout.readline()
        if not line.startswith("DCN_WORKER_READY "):
            p.terminate()
            raise RuntimeError(f"DCN worker failed to start: {line!r}")
        addrs.append(("127.0.0.1", int(line.split()[1])))
        procs.append(p)
    return procs, addrs


def _main() -> None:
    ap = argparse.ArgumentParser(description="kvazzup_tpu DCN worker")
    ap.add_argument("--port", type=int, default=9555)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--max-jobs", type=int, default=0)
    args = ap.parse_args()
    serve(args.port, args.host, max_jobs=args.max_jobs)


if __name__ == "__main__":
    _main()
