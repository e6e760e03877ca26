"""Shipped job-selection policies — the reference's probe plane.

The reference lets an operator delegate job acceptance to an external
decider (`pkg/computenode/job_selection.go:50-101`): an HTTP probe POSTs
the job data to a URL and accepts iff the response is 2xx, and an exec
probe pipes the job data to a command's stdin and accepts iff it exits 0.
These are the same two built-ins as Engine policy callables: each returns
a closure with the Engine's policy signature (spec -> bool); declining by
returning False (or by the probe failing) surfaces as the 409 rejection
path via JobRejectedError.
"""

from __future__ import annotations

import json
from collections.abc import Callable


def _probe_payload(spec) -> bytes:
    """The JobSelectionPolicyProbeData analog: everything an external
    decider needs to accept/decline, JSON-encoded."""
    return json.dumps({
        "query": spec.query,
        "inputs": dict(spec.inputs),
        "outputs": dict(spec.outputs),
        "replicas": spec.replicas,
        "verified": spec.verified,
        "annotations": list(spec.annotations),
        "resources": dict(spec.resources),
    }, sort_keys=True).encode()


def http_probe_policy(url: str, timeout: float = 10.0) -> Callable:
    """POST the job spec to `url`; accept iff the response is 2xx
    (`job_selection.go:79-101`). Connection errors and non-2xx responses
    both decline — an unreachable decider must fail closed, exactly like
    the reference's error path."""
    from urllib import request as _rq
    from urllib.error import HTTPError, URLError

    def http_probe(spec) -> bool:
        req = _rq.Request(url, data=_probe_payload(spec),
                          headers={"Content-Type": "application/json"})
        try:
            with _rq.urlopen(req, timeout=timeout) as resp:
                return 200 <= resp.status < 300
        except (HTTPError, URLError, OSError):
            return False

    http_probe.__name__ = f"http_probe({url})"
    return http_probe


def exec_probe_policy(argv: list[str], timeout: float = 10.0) -> Callable:
    """Run `argv` with the job spec JSON on stdin; accept iff it exits 0
    (`job_selection.go:50-77`). A probe that cannot run, times out, or
    exits non-zero declines."""
    import subprocess

    def exec_probe(spec) -> bool:
        try:
            proc = subprocess.run(argv, input=_probe_payload(spec),
                                  capture_output=True, timeout=timeout)
            return proc.returncode == 0
        except (OSError, subprocess.TimeoutExpired):
            return False

    exec_probe.__name__ = f"exec_probe({' '.join(argv)})"
    return exec_probe
