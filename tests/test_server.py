"""TCP submit/poll servers (raysearch/server.py — the reference's
S4/S5 surface): protocol shape, eventual results identical to
query_index, and the not-ready poll path."""

import time

import pytest

from raysearch.build import build_index
from raysearch.config import IndexConfig
from raysearch.query import query_index
from raysearch.server import NOT_READY_MESSAGE, SearchServer, request

QUERIES = ["fast hash join", "merge sort stream", "window agg"]


@pytest.fixture(scope="module")
def idx(ray_session, medium_corpus, tmp_path_factory):
    import ray.data

    d = str(tmp_path_factory.mktemp("tcpidx") / "idx")
    build_index(ray.data.from_arrow(medium_corpus), d,
                IndexConfig(num_parts=4), input_id="tcp-test")
    return d


def _poll_until_ready(port: int, qid: str, deadline: float = 30.0) -> dict:
    t0 = time.time()
    while time.time() - t0 < deadline:
        resp = request(port, {"query_id": qid})
        if resp["message"] != NOT_READY_MESSAGE:
            return resp
        time.sleep(0.05)
    raise TimeoutError(qid)


def test_submit_poll_round_trip(ray_session, idx):
    with SearchServer(idx, k=10, num_actors=2) as srv:
        # submit returns immediately with an id + echo message
        subs = []
        for q in QUERIES:
            r = request(srv.submit_port, {"query": q})
            assert r["message"] == f"Query received: {q}"
            assert len(r["query_id"]) == 36  # uuid4
            subs.append((r["query_id"], q))
        # unknown id polls as not-ready (the reference's verbatim
        # message), with empty documents and zero time
        miss = request(srv.poll_port, {"query_id": "nope"})
        assert miss["message"] == NOT_READY_MESSAGE
        assert miss["documents"] == []
        # each submitted query eventually returns the exact one-shot
        # top-k (same kernels behind the session)
        for qid, q in subs:
            got = _poll_until_ready(srv.poll_port, qid)
            want = query_index(idx, [q], k=10).to_pandas()
            assert [d for d, _ in got["documents"]] == \
                want.doc_id.tolist()
            assert [round(s, 6) for _, s in got["documents"]] == \
                [round(s, 6) for s in want.score.tolist()]
            assert got["query_processing_time"] > 0
            # reference semantics (src/lib.rs:334-337): a served
            # result is NOT consumed — re-polling returns it again
            again = request(srv.poll_port, {"query_id": qid})
            assert again["documents"] == got["documents"]


def test_malformed_request_is_contained(ray_session, idx):
    import json
    import socket

    with SearchServer(idx, num_actors=1) as srv:
        with socket.create_connection(("127.0.0.1", srv.submit_port),
                                      timeout=10) as s:
            s.sendall(b"this is not json")
            s.shutdown(socket.SHUT_WR)
            resp = json.loads(s.recv(65536))
        assert resp["message"].startswith("bad request")
        # server still serves after a bad request
        r = request(srv.submit_port, {"query": "fast hash join"})
        assert r["message"].startswith("Query received")
