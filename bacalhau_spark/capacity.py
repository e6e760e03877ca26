"""Capacity management: bounded FIFO backlog + free-capacity admission.

Reference mapping (`pkg/capacitymanager/capacitymanager.go:185-264`): jobs
land in a bounded FIFO backlog (`AddToBacklog`); a node bids only when its
free capacity covers the job's requirements (`GetNextItems` walks the
backlog in FIFO order selecting whatever fits in the remainder);
`MoveToActive`/`Remove` track the in-flight set. The reference drives
admission from a 10 s bid-loop tick (`pkg/computenode/computenode.go:141-187`);
here admission is event-driven — both submit and run-completion kick the
drain — so there is no polling latency to tune.

A job that could NEVER fit (requirements exceed total capacity) is rejected
at submit, the `TooManyItems`/impossible-resources path; a backlog at its
bound rejects too, instead of queueing unboundedly.
"""

from __future__ import annotations

import threading
from collections import deque
from dataclasses import dataclass

from bacalhau_spark.resources import parse_cpu, parse_memory


class BacklogFullError(RuntimeError):
    """The FIFO backlog is at its bound — the submit is rejected rather
    than queued (the reference's bounded-backlog contract)."""


class NeverFitsError(RuntimeError):
    """Requested resources exceed TOTAL capacity: no amount of waiting
    admits this job (`pkg/capacitymanager/capacitymanager.go:205-212`)."""


@dataclass(frozen=True)
class ResourceUsage:
    """Parsed resource vector (the ResourceUsageData analog,
    `pkg/capacitymanager/types.go:5-27`)."""
    cpu: float = 0.0
    memory: int = 0
    disk: int = 0
    gpu: int = 0

    @classmethod
    def from_spec(cls, resources: dict) -> "ResourceUsage":
        return cls(
            cpu=parse_cpu(resources.get("cpu", 0)),
            memory=parse_memory(resources.get("memory", 0)),
            disk=parse_memory(resources.get("disk", 0)),
            gpu=int(resources.get("gpu", 0) or 0),
        )

    def fits_in(self, other: "ResourceUsage") -> bool:
        return (self.cpu <= other.cpu and self.memory <= other.memory
                and self.disk <= other.disk and self.gpu <= other.gpu)

    def plus(self, other: "ResourceUsage") -> "ResourceUsage":
        return ResourceUsage(self.cpu + other.cpu,
                             self.memory + other.memory,
                             self.disk + other.disk,
                             self.gpu + other.gpu)

    def minus(self, other: "ResourceUsage") -> "ResourceUsage":
        return ResourceUsage(self.cpu - other.cpu,
                             self.memory - other.memory,
                             self.disk - other.disk,
                             self.gpu - other.gpu)


# A job that requests nothing still occupies one "slot" of the default
# job size, so max-concurrency stays bounded even for zero-spec jobs —
# the reference's DefaultJobResourceRequirements role
# (`pkg/capacitymanager/capacitymanager.go:93-101`).
DEFAULT_JOB = ResourceUsage(cpu=1.0)
# Conservative fallback used only when nothing can be probed; real
# deployments size from detect_total() (the gopsutil-probe analog) or the
# serve --limit-total-* flags.
DEFAULT_TOTAL = ResourceUsage(cpu=8.0, memory=32 << 30, disk=256 << 30,
                              gpu=0)
DEFAULT_MAX_BACKLOG = 64


def detect_total(cpus: float | None = None, memory: int | None = None,
                 disk: int | None = None, gpu: int = 0) -> ResourceUsage:
    """Probe actual system capacity — the reference sizes its capacity
    manager from the real machine (gopsutil system probe feeding
    `pkg/capacitymanager/capacitymanager.go:61-91`), not a constant.
    Explicit arguments override individual axes (the --limit-total-* flag
    semantics); anything unprobeable falls back to DEFAULT_TOTAL's axis.

    Pass `cpus=spark.sparkContext.defaultParallelism` to bind admission to
    the cores the Spark session actually has rather than the machine's.
    """
    import os
    import shutil

    if cpus is None:
        cpus = float(os.cpu_count() or DEFAULT_TOTAL.cpu)
    if memory is None:
        try:
            memory = (os.sysconf("SC_PAGE_SIZE")
                      * os.sysconf("SC_PHYS_PAGES"))
        except (ValueError, OSError, AttributeError):
            memory = DEFAULT_TOTAL.memory
    if disk is None:
        try:
            disk = shutil.disk_usage("/").free
        except OSError:
            disk = DEFAULT_TOTAL.disk
    return ResourceUsage(cpu=float(cpus), memory=int(memory),
                         disk=int(disk), gpu=int(gpu))


class CapacityManager:
    """Bounded FIFO backlog + free-capacity admission gate.

    Thread-safe; pure bookkeeping (no Spark dependency) so it is testable
    in isolation and reusable in front of any executor."""

    def __init__(self, total: ResourceUsage = DEFAULT_TOTAL,
                 max_backlog: int = DEFAULT_MAX_BACKLOG,
                 default_job: ResourceUsage = DEFAULT_JOB):
        self.total = total
        self.max_backlog = max_backlog
        self.default_job = default_job
        self._lock = threading.Lock()
        self._backlog: deque[tuple[str, ResourceUsage]] = deque()
        self._active: dict[str, ResourceUsage] = {}

    def requirements(self, resources: dict) -> ResourceUsage:
        req = ResourceUsage.from_spec(resources or {})
        if req == ResourceUsage():
            return self.default_job
        return req

    # -- introspection ------------------------------------------------------
    def free(self) -> ResourceUsage:
        with self._lock:
            return self._free_locked()

    def _free_locked(self) -> ResourceUsage:
        used = ResourceUsage()
        for r in self._active.values():
            used = used.plus(r)
        return self.total.minus(used)

    def backlog_len(self) -> int:
        with self._lock:
            return len(self._backlog)

    def active_ids(self) -> list[str]:
        with self._lock:
            return list(self._active)

    def queue_position(self, item_id: str) -> int | None:
        """0-based FIFO position, or None if not backlogged."""
        with self._lock:
            for i, (rid, _) in enumerate(self._backlog):
                if rid == item_id:
                    return i
        return None

    # -- lifecycle ----------------------------------------------------------
    def enqueue(self, item_id: str, req: ResourceUsage) -> None:
        """Admit to the backlog (AddToBacklog). Raises NeverFitsError if the
        request exceeds total capacity, BacklogFullError at the bound."""
        if not req.fits_in(self.total):
            raise NeverFitsError(
                f"job {item_id}: requested {req} exceeds total capacity "
                f"{self.total}")
        with self._lock:
            if len(self._backlog) >= self.max_backlog:
                raise BacklogFullError(
                    f"backlog full ({self.max_backlog}); job {item_id} "
                    "rejected")
            self._backlog.append((item_id, req))

    def admit_next(self) -> list[str]:
        """Move every backlogged item that fits in current free capacity to
        the active set, walking FIFO order (GetNextItems + MoveToActive).
        Returns the newly admitted ids, oldest-first."""
        admitted: list[str] = []
        with self._lock:
            free = self._free_locked()
            remaining: deque[tuple[str, ResourceUsage]] = deque()
            for rid, req in self._backlog:
                if req.fits_in(free):
                    self._active[rid] = req
                    free = free.minus(req)
                    admitted.append(rid)
                else:
                    remaining.append((rid, req))
            self._backlog = remaining
        return admitted

    def remove_backlogged(self, item_id: str) -> bool:
        """Remove a still-queued item from the backlog (the requester-side
        cancel of a job that never got a bid). Returns False if the item is
        not in the backlog (already active or unknown)."""
        with self._lock:
            for entry in self._backlog:
                if entry[0] == item_id:
                    self._backlog.remove(entry)
                    return True
        return False

    def release(self, item_id: str) -> None:
        """Return an active item's resources (Remove); no-op if unknown so
        error paths can call it unconditionally."""
        with self._lock:
            self._active.pop(item_id, None)
