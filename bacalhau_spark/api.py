"""REST API surface — the reference's public API restated for the engine.

The reference's primary user entry is an HTTP server over the controller
(`pkg/publicapi/server.go:72-85` routes; submit `:329-444`; list/states/
events views `:195-312`) plus a typed client (`pkg/publicapi/client.go:64-208`).
This module is the single-driver analog: a stdlib ThreadingHTTPServer over an
`Engine`, and a thin urllib client.

Routes:
  GET  /healthz /livez /readyz      — health probes (server_health.go analog)
  GET  /version                     — engine version
  GET  /list                        — {run_id: state} for every run
  GET  /states?run_id=X             — current state of one run
  GET  /events?run_id=X             — full event history of one run
  GET  /describe?run_id=X           — spec + state + events + manifest
  GET  /results?run_id=X&limit=N    — rows read back from the run's sink
  POST /submit   {"spec": {...}}    — run a JobSpec document; returns run_id

Submit is synchronous: the engine executes on the single Spark driver, so
the response carries the terminal state (the reference returns early and
clients poll /states; both polling and the immediate answer work here).
Submits are serialized by a lock — concurrent Spark actions on one driver
would contend for the same scheduler anyway, and the engine's event
bookkeeping is plain Python state.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib import request as _urlrequest
from urllib.error import HTTPError
from urllib.parse import parse_qs, urlparse

from bacalhau_spark import __version__
from bacalhau_spark.engine import (Engine, JobRejectedError, JobSpec,
                                   ResultsRejectedError)


class ApiServer:
    """HTTP front end over an Engine. Bind with port=0 for an ephemeral
    port (tests); `start_background()` returns once the socket is live."""

    def __init__(self, engine: Engine, host: str = "127.0.0.1",
                 port: int = 8338):
        self.engine = engine
        self._submit_lock = threading.Lock()
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
    def _reply(handler: BaseHTTPRequestHandler, code: int, obj) -> None:
        body = json.dumps(obj).encode()
        handler.send_response(code)
        handler.send_header("Content-Type", "application/json")
        handler.send_header("Content-Length", str(len(body)))
        handler.end_headers()
        handler.wfile.write(body)

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
                self._reply(handler, 200, {"runs": self.engine.list_runs()})
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
            else:
                self._reply(handler, 404,
                            {"error": f"no route {parsed.path}"})
        except KeyError as exc:
            self._reply(handler, 404, {"error": str(exc)})
        except ValueError as exc:
            self._reply(handler, 400, {"error": str(exc)})
        except Exception as exc:  # noqa: BLE001 — surface as 500, keep serving
            self._reply(handler, 500, {"error": repr(exc)})

    def _handle_post(self, handler: BaseHTTPRequestHandler) -> None:
        parsed = urlparse(handler.path)
        if parsed.path != "/submit":
            self._reply(handler, 404, {"error": f"no route {parsed.path}"})
            return
        try:
            length = int(handler.headers.get("Content-Length", "0"))
            doc = json.loads(handler.rfile.read(length) or b"{}")
            spec = JobSpec.from_dict(doc.get("spec", doc))
            with self._submit_lock:
                run_id = self.engine.submit(spec)
            self._reply(handler, 200, {"run_id": run_id,
                                       "state": self.engine.state(run_id)})
        except (ValueError, json.JSONDecodeError) as exc:
            self._reply(handler, 400, {"error": str(exc)})
        except KeyError as exc:  # unknown query name
            self._reply(handler, 404, {"error": str(exc)})
        except (JobRejectedError, ResultsRejectedError) as exc:
            self._reply(handler, 409, {"error": str(exc)})
        except Exception as exc:  # noqa: BLE001
            self._reply(handler, 500, {"error": repr(exc)})


class ApiError(RuntimeError):
    def __init__(self, status: int, message: str):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status


class ApiClient:
    """Typed client over the REST surface (`pkg/publicapi/client.go:64-208`
    analog)."""

    def __init__(self, base_url: str, timeout: float = 300.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def _request(self, path: str, payload: dict | None = None) -> dict:
        url = self.base_url + path
        data = json.dumps(payload).encode() if payload is not None else None
        req = _urlrequest.Request(
            url, data=data,
            headers={"Content-Type": "application/json"} if data else {})
        try:
            with _urlrequest.urlopen(req, timeout=self.timeout) as resp:
                return json.loads(resp.read())
        except HTTPError as exc:
            try:
                msg = json.loads(exc.read()).get("error", "")
            except Exception:  # noqa: BLE001
                msg = exc.reason
            raise ApiError(exc.code, msg) from None

    def healthz(self) -> bool:
        return self._request("/healthz").get("status") == "OK"

    def version(self) -> str:
        return self._request("/version")["version"]

    def submit(self, spec: dict) -> str:
        return self._request("/submit", {"spec": spec})["run_id"]

    def list_runs(self) -> dict[str, str]:
        return self._request("/list")["runs"]

    def states(self, run_id: str) -> str:
        return self._request(f"/states?run_id={run_id}")["state"]

    def events(self, run_id: str) -> list[dict]:
        return self._request(f"/events?run_id={run_id}")["events"]

    def describe(self, run_id: str) -> dict:
        return self._request(f"/describe?run_id={run_id}")

    def results(self, run_id: str, limit: int = 100) -> list[dict]:
        return self._request(f"/results?run_id={run_id}&limit={limit}")["rows"]
