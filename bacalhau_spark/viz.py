"""Devstack cluster visualizer — the repo analog of the reference's
`viz/` tool (`viz/main.go:1-156`, `viz/README.md`): poll every node's
API over (address, start_port, end_port) ranges, fold the responses into
a nodes+links topology document, and serve it as JSON at `/api/map`
alongside a self-contained HTML dashboard at `/`.

Differences from the reference, stated:

- The reference reads `/id` + `/peers` (the libp2p gossip mesh) and
  draws edges from the pubsub peer table. On this engine `/peers` is
  empty BY DESIGN (single-driver: the transport collapsed into Spark's
  internal RPC, SURVEY §4), so when a node reports no peers the map
  links it to the lexicographically-first node sharing its Spark
  application id — the star that actually exists (every devstack node
  is a seat over the one driver). Nodes that DO report peers (a future
  multi-driver deployment) get their reported edges verbatim.
- The reference shows only node ids; per-node `/varz` capacity
  (free/total CPU, backlog, active runs) is folded into each node row —
  the state a capacity-debugging session actually wants.
- Unreachable ports are skipped silently (the reference's
  continue-on-error loop); a node that stops answering ages out of the
  map after MISS_LIMIT consecutive misses rather than lingering
  forever.

No external assets: the dashboard page is inline HTML+JS polling
/api/map (the reference ships a static/ dir; this container has no
asset pipeline, and a table beats an uninstallable force graph).
"""

from __future__ import annotations

import json
import threading
import time
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

MISS_LIMIT = 3

_PAGE = """<!doctype html>
<html><head><title>bacalhau-spark viz</title><style>
body{font-family:monospace;margin:2em}table{border-collapse:collapse}
td,th{border:1px solid #999;padding:4px 8px;text-align:left}
caption{text-align:left;font-weight:bold;padding-bottom:6px}
</style></head><body>
<h2>bacalhau-spark devstack</h2>
<table id="t"><caption id="c"></caption>
<tr><th>node</th><th>app</th><th>cpu free/total</th><th>backlog</th>
<th>active</th><th>links</th></tr></table>
<script>
async function tick(){
  const r = await fetch('/api/map'); const m = await r.json();
  const t = document.getElementById('t');
  while (t.rows.length > 1) t.deleteRow(1);
  const out = {};
  for (const l of m.links){(out[l.source] ||= []).push(l.target);}
  for (const n of m.nodes){
    const row = t.insertRow();
    const cap = n.capacity || {};
    row.insertCell().textContent = n.id;
    row.insertCell().textContent = n.app || '';
    row.insertCell().textContent =
      (cap.free_cpu ?? '?') + ' / ' + (cap.total_cpu ?? '?');
    row.insertCell().textContent = cap.backlog ?? '?';
    row.insertCell().textContent = cap.active ?? '?';
    row.insertCell().textContent = (out[n.id] || []).join(' ');
  }
  document.getElementById('c').textContent =
    m.nodes.length + ' nodes, ' + m.links.length + ' links';
}
tick(); setInterval(tick, 1000);
</script></body></html>"""


def _get_json(url: str, timeout: float):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return json.loads(r.read().decode())


def expand_targets(specs: list[tuple[str, int, int]]) -> list[str]:
    """(address, start_port, end_port) triplets -> base URLs, the
    reference's argument shape (`viz/main.go:60-84`)."""
    return [f"http://{addr}:{port}"
            for addr, start, end in specs
            for port in range(start, end + 1)]


def poll_targets(urls: list[str], timeout: float = 2.0) -> dict:
    """One polling sweep: {url: node-state} for every URL that answered.
    Node state: id, app (Spark application id), peers, capacity summary
    from /varz."""
    out = {}
    for url in urls:
        try:
            ident = _get_json(url + "/id", timeout)["id"]
            peers = _get_json(url + "/peers", timeout).get("peers", [])
            varz = _get_json(url + "/varz", timeout)
        except Exception:
            continue  # unreachable port in the scanned range
        cap = varz.get("capacity", {})
        out[url] = {
            "id": f"{ident}@{url.rsplit(':', 1)[-1]}",
            "app": ident,
            "peers": peers,
            "capacity": {
                "free_cpu": cap.get("free", {}).get("cpu"),
                "total_cpu": cap.get("total", {}).get("cpu"),
                "backlog": cap.get("backlog"),
                "active": cap.get("active"),
            },
        }
    return out


def build_map(states: dict) -> dict:
    """Fold node states into the {nodes, links} document (the
    `updateResult` analog, `viz/main.go:35-54`) — deterministic order
    (sorted by node id) so the JSON is stable for tests and diffing."""
    nodes, links = [], []
    hub_by_app: dict[str, str] = {}
    rows = sorted(states.values(), key=lambda s: s["id"])
    for s in rows:
        hub_by_app.setdefault(s["app"], s["id"])
    for s in rows:
        nodes.append({"id": s["id"], "app": s["app"], "group": 0,
                      "capacity": s["capacity"]})
        if s["peers"]:
            links += [{"source": s["id"], "target": p}
                      for p in sorted(s["peers"])]
        elif hub_by_app[s["app"]] != s["id"]:
            links.append({"source": s["id"],
                          "target": hub_by_app[s["app"]]})
    return {"nodes": nodes, "links": links}


class VizServer:
    """Background poller + HTTP server: `/api/map` returns the current
    topology JSON, `/` the dashboard page. start()/shutdown() lifecycle
    mirrors ApiServer."""

    def __init__(self, specs: list[tuple[str, int, int]],
                 host: str = "127.0.0.1", port: int = 0,
                 interval: float = 1.0):
        self.urls = expand_targets(specs)
        self.interval = interval
        self._lock = threading.Lock()
        self._map = {"nodes": [], "links": []}
        self._misses: dict[str, int] = {}
        self._states: dict[str, dict] = {}
        self._stop = threading.Event()
        viz = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test output
                pass

            def do_GET(self):
                if self.path == "/api/map":
                    body = json.dumps(viz.current_map()).encode()
                    ctype = "application/json"
                elif self.path == "/":
                    body = _PAGE.encode()
                    ctype = "text/html"
                else:
                    self.send_error(404)
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.url = "http://%s:%d" % self._httpd.server_address

    def poll_once(self) -> dict:
        """One sweep + map rebuild; nodes age out after MISS_LIMIT
        consecutive misses. Returns the new map."""
        seen = poll_targets(self.urls)
        with self._lock:
            for url, st in seen.items():
                self._states[url] = st
                self._misses[url] = 0
            for url in list(self._states):
                if url in seen:
                    continue
                self._misses[url] = self._misses.get(url, 0) + 1
                if self._misses[url] >= MISS_LIMIT:
                    del self._states[url]
            self._map = build_map(self._states)
            return self._map

    def current_map(self) -> dict:
        with self._lock:
            return self._map

    def _loop(self):
        while not self._stop.is_set():
            self.poll_once()
            self._stop.wait(self.interval)

    def start_background(self) -> "VizServer":
        self._serving = True
        threading.Thread(target=self._loop, daemon=True).start()
        threading.Thread(target=self._httpd.serve_forever,
                         daemon=True).start()
        return self

    def shutdown(self):
        self._stop.set()
        # BaseServer.shutdown() BLOCKS until serve_forever() exits — and
        # never returns if serve_forever was never entered (a poll-only
        # VizServer that was constructed but not started); only call it
        # when the serving thread is actually running.
        if getattr(self, "_serving", False):
            self._httpd.shutdown()
        self._httpd.server_close()


def main_loop(specs, host="127.0.0.1", port=31337, interval=1.0):
    """CLI entry: serve until interrupted (viz/main.go:140-156)."""
    srv = VizServer(specs, host=host, port=port,
                    interval=interval).start_background()
    print(f"viz: watching {len(srv.urls)} ports, serving {srv.url}",
          flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.shutdown()
    return 0
