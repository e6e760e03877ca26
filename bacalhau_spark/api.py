"""REST API surface — the reference's public API restated for the engine.

The reference's primary user entry is an HTTP server over the controller
(`pkg/publicapi/server.go:72-85` routes; submit `:329-444`; list/states/
events views `:195-312`) plus a typed client (`pkg/publicapi/client.go:64-208`).
This module is the single-driver analog: a stdlib ThreadingHTTPServer over an
`Engine`, and a thin urllib client.

Routes:
  GET  /healthz /livez /readyz      — health probes (server_health.go analog)
  GET  /version                     — engine version
  GET  /id /peers                   — node identity (Spark app id) / peer
                                      table (empty: single-driver, SURVEY §4)
  GET  /varz /logz?n=N /metrics     — runtime vars (capacity + confs) /
                                      event-log tail / Prometheus text
  GET  /list                        — {run_id: state} for every run
  GET  /states?run_id=X             — current state of one run
  GET  /events?run_id=X             — full event history of one run
  GET  /describe?run_id=X           — spec + state + events + manifest
  GET  /results?run_id=X&limit=N    — rows read back from the run's sink
  POST /submit   {"spec": {...}}    — admit a JobSpec; returns run_id
  POST /pipeline {"stages": [...]}  — run a DAG-of-jobs document; returns
                                      per-stage terminal statuses (409 if
                                      any stage failed/cancelled)
  POST /cancel?run_id=X             — requester-side cancel (signed like
                                      /submit): queued runs end Cancelled
                                      immediately, running runs once their
                                      job group dies

Submit is ASYNCHRONOUS (the reference's model, `pkg/publicapi/server.go:329`):
the engine validates, runs the policy hooks, and admits the run to the
capacity manager's bounded FIFO backlog, then replies immediately with the
run id and its current state + queue position; clients poll /states. Pass
`?wait=1` to block until the terminal state instead (convenience for small
jobs and the CLI).

If the server is constructed with credentials, /submit requires the client
to sign the request: `X-Bacalhau-Client-Id` names the caller,
`X-Bacalhau-Timestamp` carries the signing time (unix seconds), and
`X-Bacalhau-Signature` carries hex
HMAC-SHA256(secret, method \\n path?query \\n timestamp \\n client_id \\n body).
Credentials are a per-client `{client_id: secret}` map — the HMAC
restatement of the reference's per-client RSA signature + client-ID↔pubkey
binding (`pkg/publicapi/server.go:391-407`): client A's key cannot sign for
client B's id, an unknown client id is rejected outright. Binding the
method, path+query, and a fresh timestamp into the signed payload means a
captured request cannot be replayed after the freshness window and a
middlebox cannot add/strip query params (e.g. `?wait=1`) without
invalidating the signature. Mismatch, staleness, or missing headers → 401.
A single shared `secret` is still accepted (any client id may sign with
it) for the simple one-tenant deployment.

DEPLOYMENT ENVELOPE (the Go-parity caveat, stated rather than papered
over): this front is one Python process — stdlib ThreadingHTTPServer
under the GIL. The round-12 read burst measured its ceiling at roughly
240-290 req/s per plane at 100-way concurrency (read_burst_r12.txt);
round 13 lifts the burst verb itself by caching the rendered /list body
per engine state REVISION (one json.dumps per state change, ETag/304 for
conditional polls — read_burst_r13.txt has the numbers). The reference's
Go net/http server (pkg/publicapi/server.go) has no per-process cap and
that difference is LANGUAGE, not design: a multiprocess front cannot
share this engine's in-memory run state (the Engine owns the ONE Spark
driver; forked handlers would serve a dead snapshot), so scaling the
API beyond one process requires externalizing run state to the
versioned store and fronting N stateless readers — the deliberate
non-goal for the single-driver engine. What IS structural — the /list
quadratic that fell over at 200 runs — was fixed in r12; what remains
is a per-process throughput envelope a deployment puts a load balancer
and read replicas in front of, exactly like any other single-process
control plane.
"""

from __future__ import annotations

import hashlib
import hmac
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib import request as _urlrequest
from urllib.error import HTTPError
from urllib.parse import parse_qs, urlencode, urlparse

from bacalhau_spark import __version__
from bacalhau_spark.engine import (Engine, JobRejectedError, JobSpec,
                                   ResultsRejectedError, RunNotCompleteError)


# Signatures older (or more in the future) than this are rejected: bounds
# the replay window of a captured signed request.
AUTH_FRESHNESS_S = 300.0


def _sign(secret: str, client_id: str, body: bytes,
          method: str = "POST", path_qs: str = "/submit",
          timestamp: str = "") -> str:
    payload = b"\n".join((method.encode(), path_qs.encode(),
                          timestamp.encode(), client_id.encode(), body))
    return hmac.new(secret.encode(), payload, hashlib.sha256).hexdigest()


class AuthError(RuntimeError):
    """Submit signature missing or invalid (mapped to 401)."""


class ApiServer:
    """HTTP front end over an Engine. Bind with port=0 for an ephemeral
    port (tests); `start_background()` returns once the socket is live."""

    def __init__(self, engine: Engine, host: str = "127.0.0.1",
                 port: int = 8338, secret: str | None = None,
                 credentials: dict[str, str] | None = None,
                 max_wait_s: float = 3600.0):
        """`credentials` binds each client id to its own signing secret
        (the per-client key binding, `pkg/publicapi/server.go:391-407`);
        `secret` is the shared-key alternative for one-tenant deployments.
        `max_wait_s` bounds how long a `?wait=1` submit may park its
        handler thread when the spec itself carries no timeout."""
        self.engine = engine
        self.secret = secret
        self.credentials = dict(credentials) if credentials else None
        self.max_wait_s = max_wait_s
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *_args):  # quiet test/daemon logs
                pass

            def do_GET(self):
                server._handle_get(self)

            def do_POST(self):
                server._handle_post(self)

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self.httpd.server_address[:2]
        self._thread: threading.Thread | None = None
        # /list response cache, keyed by the engine's monotone state
        # revision: the burst verb renders once per state CHANGE, not
        # once per request (r13; see the GIL-envelope note below)
        self._list_cache: tuple[int, bytes] | None = None

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}"

    # -- lifecycle ----------------------------------------------------------
    def serve_forever(self) -> None:
        self.httpd.serve_forever()

    def start_background(self) -> "ApiServer":
        self._thread = threading.Thread(target=self.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)

    # -- request handling ----------------------------------------------------
    @staticmethod
    def _reply_bytes(handler: BaseHTTPRequestHandler, code: int,
                     body: bytes, etag: str | None = None) -> None:
        handler.send_response(code)
        handler.send_header("Content-Type", "application/json")
        handler.send_header("Content-Length", str(len(body)))
        if etag is not None:
            handler.send_header("ETag", etag)
        handler.end_headers()
        handler.wfile.write(body)

    @staticmethod
    def _reply(handler: BaseHTTPRequestHandler, code: int, obj) -> None:
        ApiServer._reply_bytes(handler, code, json.dumps(obj).encode())

    def _run_id(self, query: dict) -> str:
        vals = query.get("run_id")
        if not vals:
            raise ValueError("missing run_id parameter")
        return vals[0]

    def _handle_get(self, handler: BaseHTTPRequestHandler) -> None:
        parsed = urlparse(handler.path)
        qs = parse_qs(parsed.query)
        try:
            if parsed.path in ("/healthz", "/livez", "/readyz"):
                self._reply(handler, 200, {"status": "OK"})
            elif parsed.path == "/version":
                self._reply(handler, 200, {"version": __version__})
            elif parsed.path == "/list":
                # rev is read before AND after list_runs, and the
                # render is cached/ETagged only when the two reads
                # agree (r13 ADVICE): an emit landing mid-render would
                # otherwise stamp a NEWER body with the OLDER rev, so a
                # client holding the older ETag could get a 304 against
                # a body it does not actually have. On disagreement we
                # serve the fresh body unstamped (no ETag, not cached)
                # and the next request observes the settled rev.
                rev = self.engine.state_rev()
                cache = self._list_cache
                if cache is None or cache[0] != rev:
                    body = json.dumps(
                        {"runs": self.engine.list_runs()}).encode()
                    if self.engine.state_rev() == rev:
                        cache = (rev, body)
                        self._list_cache = cache
                    else:
                        self._reply_bytes(handler, 200, body)
                        return
                etag = f'"{cache[0]}"'
                if handler.headers.get("If-None-Match") == etag:
                    handler.send_response(304)
                    handler.send_header("ETag", etag)
                    handler.end_headers()
                else:
                    self._reply_bytes(handler, 200, cache[1], etag=etag)
            elif parsed.path == "/states":
                rid = self._run_id(qs)
                self._reply(handler, 200,
                            {"run_id": rid, "state": self.engine.state(rid)})
            elif parsed.path == "/events":
                rid = self._run_id(qs)
                evts = self.engine.events(rid)
                if not evts:
                    raise KeyError(rid)
                self._reply(handler, 200, {"run_id": rid, "events": [
                    {"ordinal": e.ordinal, "name": e.name, "ts": e.ts,
                     "detail": e.detail}
                    for e in sorted(evts, key=lambda e: e.ordinal)]})
            elif parsed.path == "/describe":
                self._reply(handler, 200,
                            self.engine.describe(self._run_id(qs)))
            elif parsed.path == "/results":
                rid = self._run_id(qs)
                limit = int(qs.get("limit", ["100"])[0])
                rows = self.engine.fetch_results(rid, limit=limit)
                self._reply(handler, 200, {"run_id": rid, "rows": rows},)
            elif parsed.path == "/local_events":
                # the node-local event view (single node ⇒ all events),
                # pkg/publicapi/server.go /local_events analog
                evts = self.engine.events()
                self._reply(handler, 200, {"events": [
                    {"run_id": e.run_id, "ordinal": e.ordinal,
                     "name": e.name, "ts": e.ts, "detail": e.detail}
                    for e in evts]})
            elif parsed.path == "/resultfiles":
                rid = self._run_id(qs)
                files = self.engine.result_files(rid)
                self._reply(handler, 200, {"run_id": rid, "files": files})
            elif parsed.path == "/id":
                # node identity (/id, server.go:76): the single driver's
                # stable identity is its Spark application id
                self._reply(handler, 200, {
                    "id": self.engine.spark.sparkContext.applicationId})
            elif parsed.path == "/peers":
                # /peers (server.go:77) — the libp2p peer table collapses
                # to empty on the single-driver engine (SURVEY §4); the
                # route exists so clients probing topology get a typed
                # answer instead of a 404
                self._reply(handler, 200, {"peers": []})
            elif parsed.path == "/varz":
                # /varz (server.go:82): runtime variables — capacity
                # totals/free and the session's scale-relevant confs
                cap = self.engine.capacity
                free, total = cap.free(), cap.total
                conf = self.engine.spark.conf
                keys = ("spark.sql.shuffle.partitions",
                        "spark.sql.adaptive.enabled",
                        "spark.sql.session.timeZone")
                self._reply(handler, 200, {
                    "capacity": {
                        "total": {"cpu": total.cpu, "memory": total.memory,
                                  "disk": total.disk, "gpu": total.gpu},
                        "free": {"cpu": free.cpu, "memory": free.memory,
                                 "disk": free.disk, "gpu": free.gpu},
                        "backlog": cap.backlog_len(),
                        "active": len(cap.active_ids())},
                    "spark": {k: conf.get(k, None) for k in keys}})
            elif parsed.path == "/logz":
                # /logz (server.go:81): the engine's event log tail as
                # plain text lines, newest last
                n = max(0, int(qs.get("n", ["100"])[0]))
                tail = self.engine.events()[-n:] if n else []
                lines = [f"{e.ts:.3f} {e.run_id} [{e.ordinal}] "
                         f"{e.name} {e.detail}" for e in tail]
                self._reply(handler, 200, {"lines": lines})
            elif parsed.path == "/metrics":
                # /metrics (server.go:85): minimal Prometheus text
                # exposition — run states and capacity axes
                from collections import Counter
                states = Counter(self.engine.list_runs().values())
                cap = self.engine.capacity
                free = cap.free()
                out = ["# TYPE bacalhau_runs_total counter"]
                out += [f'bacalhau_runs_total{{state="{s}"}} {n}'
                        for s, n in sorted(states.items())]
                out += ["# TYPE bacalhau_capacity_free gauge",
                        f'bacalhau_capacity_free{{axis="cpu"}} {free.cpu}',
                        f'bacalhau_capacity_free{{axis="memory"}} '
                        f'{free.memory}',
                        "# TYPE bacalhau_backlog_len gauge",
                        f"bacalhau_backlog_len {cap.backlog_len()}"]
                body = ("\n".join(out) + "\n").encode()
                handler.send_response(200)
                handler.send_header("Content-Type",
                                    "text/plain; version=0.0.4")
                handler.send_header("Content-Length", str(len(body)))
                handler.end_headers()
                handler.wfile.write(body)
            else:
                self._reply(handler, 404,
                            {"error": f"no route {parsed.path}"})
        except KeyError as exc:
            self._reply(handler, 404, {"error": str(exc)})
        except ValueError as exc:
            self._reply(handler, 400, {"error": str(exc)})
        except RunNotCompleteError as exc:  # results not (yet) readable
            self._reply(handler, 409, {"error": str(exc)})
        except Exception as exc:  # noqa: BLE001 — surface as 500, keep serving
            self._reply(handler, 500, {"error": repr(exc)})

    def _check_auth(self, handler: BaseHTTPRequestHandler,
                    body: bytes, path_qs: str) -> None:
        if self.secret is None and self.credentials is None:
            return
        import time as _time

        client_id = handler.headers.get("X-Bacalhau-Client-Id", "")
        signature = handler.headers.get("X-Bacalhau-Signature", "")
        timestamp = handler.headers.get("X-Bacalhau-Timestamp", "")
        if not client_id or not signature or not timestamp:
            raise AuthError("submit requires X-Bacalhau-Client-Id, "
                            "X-Bacalhau-Timestamp and X-Bacalhau-Signature "
                            "headers")
        try:
            skew = abs(_time.time() - float(timestamp))
        except ValueError:
            raise AuthError(f"bad timestamp {timestamp!r}")
        if skew > AUTH_FRESHNESS_S:
            raise AuthError(
                f"signature timestamp outside the {AUTH_FRESHNESS_S:.0f}s "
                "freshness window")
        if self.credentials is not None:
            # Per-client binding: the id names WHICH key must verify —
            # an unknown id has no key, and client A's key never verifies
            # a request claiming to be client B.
            secret = self.credentials.get(client_id)
            if secret is None:
                raise AuthError(f"unknown client {client_id!r}")
        else:
            secret = self.secret
        want = _sign(secret, client_id, body, handler.command, path_qs,
                     timestamp)
        if not hmac.compare_digest(signature, want):
            raise AuthError(f"bad signature for client {client_id!r}")

    def _handle_pipeline(self, handler: BaseHTTPRequestHandler,
                         parsed) -> None:
        """POST /pipeline: run a DAG-of-jobs document SYNCHRONOUSLY (waves
        already parallelize inside the engine; the response carries every
        stage's terminal status). Signed like /submit."""
        from bacalhau_spark.engine import PipelineError
        try:
            length = int(handler.headers.get("Content-Length", "0"))
            body = handler.rfile.read(length) or b"{}"
            self._check_auth(handler, body, handler.path)
            doc = json.loads(body)
            stages = doc["stages"] if isinstance(doc, dict) else doc
            try:
                statuses = self.engine.submit_pipeline(stages)
                failed = False
            except PipelineError as exc:
                statuses, failed = exc.statuses, True
            out = {"stages": {
                n: (st if st in ("Cancelled", "Rejected")
                    else self.engine.state(st))
                for n, st in statuses.items()},
                "run_ids": statuses, "failed": failed}
            self._reply(handler, 409 if failed else 200, out)
        except AuthError as exc:
            self._reply(handler, 401, {"error": str(exc)})
        except (ValueError, json.JSONDecodeError, KeyError) as exc:
            self._reply(handler, 400, {"error": repr(exc)})
        except Exception as exc:  # noqa: BLE001
            self._reply(handler, 500, {"error": repr(exc)})

    def _handle_post(self, handler: BaseHTTPRequestHandler) -> None:
        parsed = urlparse(handler.path)
        if parsed.path == "/pipeline":
            self._handle_pipeline(handler, parsed)
            return
        if parsed.path == "/cancel":
            # requester-side cancel (JobStateCancelled analog). Signed
            # like /submit: an unauthenticated caller must not be able
            # to kill another client's runs.
            try:
                length = int(handler.headers.get("Content-Length", "0"))
                body = handler.rfile.read(length) or b"{}"
                self._check_auth(handler, body, handler.path)
                qs = parse_qs(parsed.query)
                run_id = qs.get("run_id", [""])[0]
                state = self.engine.cancel(run_id)
                self._reply(handler, 200, {"run_id": run_id,
                                           "state": state})
            except AuthError as exc:
                self._reply(handler, 401, {"error": str(exc)})
            except KeyError as exc:
                self._reply(handler, 404, {"error": str(exc)})
            except Exception as exc:  # noqa: BLE001
                self._reply(handler, 500, {"error": repr(exc)})
            return
        if parsed.path != "/submit":
            self._reply(handler, 404, {"error": f"no route {parsed.path}"})
            return
        try:
            qs = parse_qs(parsed.query)
            length = int(handler.headers.get("Content-Length", "0"))
            body = handler.rfile.read(length) or b"{}"
            self._check_auth(handler, body, handler.path)
            doc = json.loads(body)
            spec = JobSpec.from_dict(doc.get("spec", doc))
            run_id = self.engine.submit_async(spec)
            if qs.get("wait", ["0"])[0] in ("1", "true"):
                # Bounded even when the spec has no timeout: the engine's
                # timeout watchdog cancels only Spark job groups, so a run
                # stuck in pure-Python registry code would otherwise park
                # this handler thread forever. On expiry the run keeps
                # going; the client gets its current state and polls.
                bound = (spec.timeout_s + 60.0 if spec.timeout_s
                         else self.max_wait_s)
                try:
                    self.engine.wait(run_id, timeout=bound)
                except (JobRejectedError, ResultsRejectedError):
                    raise
                except Exception:  # noqa: BLE001 — state carries the story
                    pass
            pos = self.engine.capacity.queue_position(run_id)
            out = {"run_id": run_id, "state": self.engine.state(run_id)}
            if pos is not None:
                out["queue_position"] = pos
            self._reply(handler, 200, out)
        except AuthError as exc:
            self._reply(handler, 401, {"error": str(exc)})
        except (ValueError, json.JSONDecodeError) as exc:
            self._reply(handler, 400, {"error": str(exc)})
        except KeyError as exc:  # unknown query name
            self._reply(handler, 404, {"error": str(exc)})
        except (JobRejectedError, ResultsRejectedError) as exc:
            self._reply(handler, 409, {"error": str(exc)})
        except Exception as exc:  # noqa: BLE001
            self._reply(handler, 500, {"error": repr(exc)})


class ApiError(RuntimeError):
    def __init__(self, status: int, message: str, body: dict | None = None):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status
        self.body = body or {}


class ApiClient:
    """Typed client over the REST surface (`pkg/publicapi/client.go:64-208`
    analog). Pass `client_id` + `secret` to sign submits for a server
    constructed with the matching shared secret."""

    def __init__(self, base_url: str, timeout: float = 300.0,
                 client_id: str | None = None, secret: str | None = None):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self.client_id = client_id
        self.secret = secret

    def _request(self, path: str, params: dict | None = None,
                 payload: dict | None = None) -> dict:
        if params:
            path = f"{path}?{urlencode(params)}"
        url = self.base_url + path
        data = json.dumps(payload).encode() if payload is not None else None
        headers = {"Content-Type": "application/json"} if data else {}
        if data is not None and self.secret is not None:
            import time as _time

            cid = self.client_id or "anonymous"
            ts = str(int(_time.time()))
            headers["X-Bacalhau-Client-Id"] = cid
            headers["X-Bacalhau-Timestamp"] = ts
            headers["X-Bacalhau-Signature"] = _sign(
                self.secret, cid, data, "POST", path, ts)
        req = _urlrequest.Request(url, data=data, headers=headers)
        try:
            with _urlrequest.urlopen(req, timeout=self.timeout) as resp:
                return json.loads(resp.read())
        except HTTPError as exc:
            try:
                body = json.loads(exc.read())
                msg = body.get("error", "")
            except Exception:  # noqa: BLE001
                body, msg = {}, exc.reason
            raise ApiError(exc.code, msg, body) from None

    def healthz(self) -> bool:
        return self._request("/healthz").get("status") == "OK"

    def version(self) -> str:
        return self._request("/version")["version"]

    def submit(self, spec: dict, wait: bool = True) -> str:
        """Submit a spec. `wait=True` (default) blocks until the terminal
        state — the small-job convenience; `wait=False` returns as soon as
        the run is admitted (the reference's poll model)."""
        params = {"wait": "1"} if wait else None
        return self._request("/submit", params, {"spec": spec})["run_id"]

    def submit_async(self, spec: dict) -> dict:
        """Non-blocking submit; returns {run_id, state[, queue_position]}."""
        return self._request("/submit", None, {"spec": spec})

    def pipeline(self, stages: list[dict]) -> dict:
        """Run a DAG-of-jobs document; returns {stages, run_ids, failed}.
        A pipeline with failed/cancelled stages surfaces as HTTP 409 whose
        body still carries every stage's status — re-shaped here so the
        caller always gets the status map."""
        try:
            return self._request("/pipeline", None, {"stages": stages})
        except ApiError as exc:
            if exc.status == 409 and "stages" in exc.body:
                return exc.body
            raise

    def node_id(self) -> str:
        return self._request("/id")["id"]

    def peers(self) -> list:
        return self._request("/peers")["peers"]

    def varz(self) -> dict:
        return self._request("/varz")

    def logz(self, n: int = 100) -> list[str]:
        return self._request("/logz", {"n": n})["lines"]

    def metrics(self) -> str:
        """Prometheus text exposition (not JSON)."""
        url = self.base_url + "/metrics"
        with _urlrequest.urlopen(
                _urlrequest.Request(url), timeout=self.timeout) as resp:
            return resp.read().decode()

    def cancel(self, run_id: str) -> str:
        """Cancel a queued or running run; returns its state after the
        call (Cancelled immediately for queued runs; running runs drain
        to Cancelled once their job group dies)."""
        return self._request("/cancel", {"run_id": run_id}, {})["state"]

    def list_runs(self) -> dict[str, str]:
        return self._request("/list")["runs"]

    def states(self, run_id: str) -> str:
        return self._request("/states", {"run_id": run_id})["state"]

    def events(self, run_id: str) -> list[dict]:
        return self._request("/events", {"run_id": run_id})["events"]

    def local_events(self) -> list[dict]:
        return self._request("/local_events")["events"]

    def describe(self, run_id: str) -> dict:
        return self._request("/describe", {"run_id": run_id})

    def results(self, run_id: str, limit: int = 100) -> list[dict]:
        return self._request("/results",
                             {"run_id": run_id, "limit": limit})["rows"]

    def download(self, run_id: str, output_dir: str) -> list[str]:
        """Fetch the run's published result FILES into output_dir — the
        `bacalhau get --output-dir` analog. Returns the written paths."""
        import base64
        import os

        files = self._request("/resultfiles", {"run_id": run_id})["files"]
        written = []
        for f in files:
            dest = os.path.join(output_dir, f["path"])
            if os.path.commonpath(
                    [os.path.abspath(dest),
                     os.path.abspath(output_dir)]) != os.path.abspath(
                         output_dir):
                raise ValueError(f"refusing path escape: {f['path']!r}")
            os.makedirs(os.path.dirname(dest) or output_dir, exist_ok=True)
            with open(dest, "wb") as out:
                out.write(base64.b64decode(f["b64"]))
            written.append(dest)
        return written
