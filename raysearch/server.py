"""TCP query submit/poll servers — the reference's S4/S5 surface
(/root/reference/src/server.rs:34-61 submit, :63-118 poll) re-expressed
over the resident Ray actor pool.

Protocol (one JSON request/response exchange per connection, exactly
the reference's shape):

- SUBMIT (reference port 8080): request ``{"query": "<text>"}`` ->
  response ``{"query_id": "<uuid>", "message": "Query received: <text>"}``.
  The query is enqueued; the connection never blocks on scoring.
- POLL (reference port 8081): request ``{"query_id": "<uuid>"}`` ->
  response ``{"documents": [[doc_id, score], ...], "message":
  "Query result: ..." | "No result yet, check again...",
  "query_processing_time": <seconds>}``. The not-ready message string
  is the reference's verbatim. (The reference's documents are
  (filename, overlap-count) pairs; this engine's are
  (doc_id, score) — same list-of-pairs shape.)

Ray-native execution: a single worker thread drains the submit queue
in batches and runs them through ONE ``QuerySession.query_batch`` call
(the segment-affine resident actor pool, postings LRU, bit-identical
to ``query_index``) — concurrent submitters share a batch instead of
queueing serially, which is the Ray-shaped replacement for the
reference's per-query channel worker (src/processor.rs:83-144).

Ports default to 0 (ephemeral, read back from the socket) so tests and
co-located servers never collide; pass the reference's 8080/8081 to
match it exactly.
"""

from __future__ import annotations

import json
import queue
import socketserver
import threading
import time
import uuid

from raysearch.serve import QuerySession

_MAX_REQUEST = 65536
NOT_READY_MESSAGE = "No result yet, check again..."


class _OneShotJSONHandler(socketserver.BaseRequestHandler):
    """One recv -> one JSON -> one send, like the reference handlers."""

    RECV_TIMEOUT = 10.0  # a silent/half-open client must not pin a thread

    def handle(self) -> None:  # pragma: no cover - exercised via socket
        self.request.settimeout(self.RECV_TIMEOUT)
        buf = b""
        req = None
        try:
            while len(buf) < _MAX_REQUEST:
                b = self.request.recv(4096)
                if not b:
                    break
                buf += b
                try:  # accept as soon as the accumulated bytes parse
                    req = json.loads(buf)
                    break
                except ValueError:
                    continue
        except OSError:  # timeout / reset: fall through with what we have
            pass
        try:
            if req is None:
                req = json.loads(buf)
            resp = self.server.respond(req)  # type: ignore[attr-defined]
        except Exception as e:  # malformed request -> error envelope
            resp = {"message": f"bad request: {e}"}
        try:
            self.request.sendall(json.dumps(resp).encode())
        except OSError:  # client already gone
            pass


class _Server(socketserver.ThreadingTCPServer):
    daemon_threads = True
    allow_reuse_address = True

    def __init__(self, port: int, respond):
        super().__init__(("127.0.0.1", port), _OneShotJSONHandler)
        self.respond = respond


class SearchServer:
    """Submit/poll TCP pair over a resident QuerySession.

    >>> srv = SearchServer(index_dir)          # ephemeral ports
    >>> srv.submit_port, srv.poll_port
    >>> srv.close()
    """

    BATCH_MAX = 64  # queries drained into one resident batch
    # the reference's get_query_result (src/lib.rs:334-337) is
    # NON-DESTRUCTIVE — re-polling a served query_id returns the same
    # result again — so results stay until evicted by this LRU cap
    # (reads move-to-end; least-recently-polled evicted first), which
    # bounds the map against clients that submit and never poll
    RESULTS_MAX = 4096

    def __init__(self, index_dir: str, k: int = 10, mode: str = "bm25",
                 num_actors: int | None = None,
                 submit_port: int = 0, poll_port: int = 0,
                 session: QuerySession | None = None):
        self.k, self.mode = k, mode
        self._session = session or QuerySession(index_dir,
                                                num_actors=num_actors)
        self._own_session = session is None
        self._queue: queue.Queue = queue.Queue()
        self._results: dict[str, dict] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()

        self._submit_srv = _Server(submit_port, self._on_submit)
        self._poll_srv = _Server(poll_port, self._on_poll)
        self.submit_port = self._submit_srv.server_address[1]
        self.poll_port = self._poll_srv.server_address[1]
        self._threads = [
            threading.Thread(target=self._submit_srv.serve_forever,
                             daemon=True),
            threading.Thread(target=self._poll_srv.serve_forever,
                             daemon=True),
            threading.Thread(target=self._worker, daemon=True),
        ]
        for t in self._threads:
            t.start()

    # -- handlers (run in socketserver threads) --

    def _on_submit(self, req: dict) -> dict:
        q = str(req["query"])
        qid = str(uuid.uuid4())
        self._queue.put((qid, q))
        return {"query_id": qid, "message": f"Query received: {q}"}

    def _on_poll(self, req: dict) -> dict:
        qid = str(req["query_id"])
        with self._lock:  # non-destructive read, LRU move-to-end
            got = self._results.pop(qid, None)
            if got is not None:
                self._results[qid] = got
        if got is None:
            return {"documents": [], "message": NOT_READY_MESSAGE,
                    "query_processing_time": 0.0}
        if "error" in got:
            return {"documents": [],
                    "message": f"Query failed: {got['error']}",
                    "query_processing_time": got["secs"]}
        return {"documents": got["documents"],
                "message": "Query result: "
                           f"{len(got['documents'])} documents",
                "query_processing_time": got["secs"]}

    # -- worker (one resident batch per drain) --

    def _worker(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            while len(batch) < self.BATCH_MAX:
                try:
                    batch.append(self._queue.get_nowait())
                except queue.Empty:
                    break
            t0 = time.perf_counter()
            try:
                tbl = self._session.query_batch([q for _, q in batch],
                                                k=self.k, mode=self.mode)
                secs = time.perf_counter() - t0
                df = tbl.to_pandas()
                results = {}
                for qi, (qid, _) in enumerate(batch):
                    sub = df[df.query_id == qi]
                    results[qid] = {
                        "documents": [[int(d), float(s)] for d, s in
                                      zip(sub.doc_id, sub.score)],
                        "secs": secs,
                    }
            except Exception as e:
                # the drain loop must survive any scoring failure: record
                # a poll-visible error per query and keep serving
                secs = time.perf_counter() - t0
                results = {qid: {"error": f"{type(e).__name__}: {e}",
                                 "secs": secs} for qid, _ in batch}
            with self._lock:
                self._results.update(results)
                while len(self._results) > self.RESULTS_MAX:
                    # dict preserves insertion order -> oldest first
                    self._results.pop(next(iter(self._results)))

    def close(self) -> None:
        self._stop.set()
        self._submit_srv.shutdown()
        self._poll_srv.shutdown()
        self._submit_srv.server_close()
        self._poll_srv.server_close()
        if self._own_session:
            self._session.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def request(port: int, payload: dict, timeout: float = 10.0) -> dict:
    """One client exchange (the reference's client shape,
    src/bin/test.rs:34-74): connect, send JSON, read JSON reply."""
    import socket

    with socket.create_connection(("127.0.0.1", port),
                                  timeout=timeout) as s:
        s.sendall(json.dumps(payload).encode())
        s.shutdown(socket.SHUT_WR)
        chunks = []
        while True:
            b = s.recv(_MAX_REQUEST)
            if not b:
                break
            chunks.append(b)
    return json.loads(b"".join(chunks))
