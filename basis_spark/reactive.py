"""Reactive change-propagation runtime (SURVEY.md §1.1: the reference's
"new upstream data triggers downstream recomputation of only the new
blocks" contract, as a long-running subscription loop rather than the
lazy re-evaluate-the-plan mapping `pipeline.Graph` provides).

Model (mirrors the reference's block/stream semantics):

- Every node's output is an APPEND-ONLY sequence of parquet blocks
  (`base_dir/<node>/block=N/`). Blocks are immutable: a re-run appends
  block N+1, never rewrites.
- A source node is fed externally (`feed()` — the ingestion API).
- A transform node declares inputs and a python fn over increment
  DataFrames: on each propagation pass the fn receives ONLY the blocks
  each input produced since this node last consumed it, and its result
  is appended as the node's next block. Each (consumer, input, block)
  is processed AT MOST ONCE; consumption state is a JSON high-watermark
  file per node (`base_dir/<node>/_consumed.json` — the reference's
  metadata-DB consumption log), so a restarted Reactor resumes exactly
  where the last one stopped.
- `poll()` runs one propagation pass in topological order — a new
  source block flows through the whole downstream cone in a single
  pass. `run_until_idle()` polls until a pass moves no data.

Scale notes: an increment is read as a plain parquet scan of just the
new block dirs (partition-pruned by construction — old blocks are never
re-read, the at-most-once contract is also the incremental-scan
optimization); per-pass driver work is file listing + one JSON write
per advanced node. Transform fns are ordinary DataFrame code, so
Catalyst fuses each node's increment plan; aggregating nodes follow the
reference's accumulator pattern (emit per-increment partials, merge on
read — see rollup_incremental) rather than holding driver state.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from dataclasses import dataclass, field
from glob import glob

from pyspark.sql import DataFrame, SparkSession


@dataclass
class _RNode:
    name: str
    fn: Callable[..., DataFrame] | None = None  # None => source
    inputs: list[str] = field(default_factory=list)


class Reactor:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base = base_dir
        self._nodes: dict[str, _RNode] = {}
        os.makedirs(base_dir, exist_ok=True)

    # ---------------------------------------------------- wiring ----
    def source(self, name: str) -> None:
        self._nodes[name] = _RNode(name=name)

    def node(self, name: str, fn: Callable[..., DataFrame], inputs: list[str]) -> None:
        missing = [u for u in inputs if u not in self._nodes]
        if missing:
            raise ValueError(f"node {name!r}: unknown inputs {missing}")
        self._nodes[name] = _RNode(name=name, fn=fn, inputs=inputs)

    # ---------------------------------------------------- storage ----
    def _dir(self, name: str) -> str:
        return os.path.join(self.base, name)

    def _blocks(self, name: str) -> list[str]:
        return sorted(
            glob(os.path.join(self._dir(name), "block=*")),
            key=lambda p: int(p.rsplit("=", 1)[1]),
        )

    def n_blocks(self, name: str) -> int:
        return len(self._blocks(name))

    def _state_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "_consumed.json")

    def _consumed(self, name: str) -> dict[str, int]:
        p = self._state_path(name)
        if os.path.exists(p):
            return json.load(open(p))
        return {}

    def _commit_consumed(self, name: str, state: dict[str, int]) -> None:
        p = self._state_path(name)
        tmp = f"{p}.tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(state, fh)
        os.replace(tmp, p)

    def _append_block(self, name: str, df: DataFrame) -> int:
        # Write to a staging dir, then publish with one atomic rename:
        # a concurrent reader (the serve() daemon polling while feed()
        # runs in another thread/process) must either see the complete
        # block or no block — listing a half-written block=N dir made
        # spark.read fail with UNABLE_TO_INFER_SCHEMA (no committed
        # footer yet). Staging dirs start with '_' so _blocks() never
        # globs them.
        n = self.n_blocks(name)
        tmp = os.path.join(self._dir(name), f"_staging_block_{n}_{os.getpid()}")
        df.write.mode("overwrite").parquet(tmp)
        # Publish: if a concurrent appender took block=n between the
        # n_blocks() read and our rename, retry the RENAME ONLY at the
        # next free index — the staged parquet needs no rewrite, so the
        # lost race costs one directory listing, not a Spark job. Eight
        # consecutive losses means something other than appends is
        # racing on this node dir; surface the OSError then.
        import shutil

        for _ in range(8):
            final = os.path.join(self._dir(name), f"block={n}")
            try:
                os.rename(tmp, final)
                return n
            except OSError:
                n = max(self.n_blocks(name), n + 1)
        shutil.rmtree(tmp, ignore_errors=True)
        raise OSError(
            f"could not publish block for node {name!r}: lost the rename "
            f"race 8 times (last tried index {n})"
        )

    # ------------------------------------------------------- feed ----
    def feed(self, name: str, df: DataFrame) -> int:
        """Append a new block to a source node; returns its index."""
        if self._nodes[name].fn is not None:
            raise ValueError(f"{name!r} is a transform node; only sources are fed")
        return self._append_block(name, df)

    # ---------------------------------------------------- reading ----
    def read(self, name: str) -> DataFrame:
        """Full accumulated output of a node (union of all its blocks)."""
        blocks = self._blocks(name)
        if not blocks:
            raise ValueError(f"node {name!r} has produced no blocks yet")
        return self.spark.read.parquet(*blocks)

    def _read_increment(self, name: str, frm: int, to: int) -> DataFrame | None:
        # Half-open [frm:to] slice, NOT [frm:]: poll() records `to` as
        # consumed, so a block appended by a concurrent feed() between
        # the n_blocks() listing and this glob must be left for the next
        # pass — reading it now would process it without recording it,
        # and the next poll would emit its rows a second time.
        blocks = self._blocks(name)[frm:to]
        return self.spark.read.parquet(*blocks) if blocks else None

    # ------------------------------------------------- propagation ----
    def _topo(self) -> list[str]:
        order: list[str] = []
        seen: set[str] = set()

        def visit(n: str, path: tuple[str, ...]) -> None:
            if n in seen:
                return
            if n in path:
                raise ValueError(f"cycle at {n!r}")
            for u in self._nodes[n].inputs:
                visit(u, path + (n,))
            seen.add(n)
            order.append(n)

        for n in self._nodes:
            visit(n, ())
        return order

    def poll(self) -> dict[str, int]:
        """One propagation pass: every transform node with unconsumed
        upstream blocks runs over exactly those increments and appends
        one output block. Returns {node: appended block index} for the
        nodes that moved. Topological order means a fresh source block
        reaches the deepest downstream node in a single poll."""
        moved: dict[str, int] = {}
        for name in self._topo():
            nd = self._nodes[name]
            if nd.fn is None:
                continue
            state = self._consumed(name)
            incs: list[DataFrame] = []
            fresh = False
            new_state = dict(state)
            for u in nd.inputs:
                frm = state.get(u, 0)
                have = self.n_blocks(u)
                inc = self._read_increment(u, frm, have)
                if inc is not None:
                    fresh = True
                incs.append(inc)
                new_state[u] = have
            if not fresh:
                continue
            out = nd.fn(*incs)  # None increments: input had nothing new
            moved[name] = self._append_block(name, out)
            # Commit consumption AFTER the block lands: a crash between
            # the two re-processes the increment (at-least-once within
            # the pass) but never skips one; readers dedupe on replay
            # the same way the reference replays an uncommitted block.
            self._commit_consumed(name, new_state)
        return moved

    def run_until_idle(self, max_polls: int = 100) -> int:
        """Poll until a pass moves nothing; returns number of passes."""
        for i in range(max_polls):
            if not self.poll():
                return i
        raise RuntimeError(f"not idle after {max_polls} polls")

    # ------------------------------------------------------ daemon ----
    # The reference runs change propagation as a PERSISTENT service, not
    # a caller-driven poll loop. serve() is that runtime shape: a
    # long-running subscription daemon that owns a single-writer lease
    # on the reactor directory, polls continuously, and sleeps only
    # when a pass moved nothing. Everything serve() relies on for
    # correctness is the machinery above (at-most-once consumption
    # watermarks, commit-after-block crash ordering), so a daemon
    # killed at ANY instruction resumes exactly where it stopped when
    # the next one takes the lease.

    def _lease_path(self) -> str:
        return os.path.join(self.base, "_leader.lock")

    def _acquire_lease(self, lease_ttl_s: float) -> None:
        """Single-writer lease via O_EXCL create. A lease whose file
        mtime is older than lease_ttl_s is considered abandoned (the
        holder died without release) and is stolen; the live holder
        re-touches the file every pass, so a healthy daemon is never
        stolen from. Best-effort on a local FS — an object store would
        use conditional-put, a cluster a real lock service; the
        CONTRACT (one writer per reactor dir) is what matters."""
        import time

        while True:
            try:
                fd = os.open(
                    self._lease_path(), os.O_CREAT | os.O_EXCL | os.O_WRONLY
                )
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return
            except FileExistsError:
                try:
                    age = time.time() - os.path.getmtime(self._lease_path())
                except OSError:
                    continue  # holder released between our two syscalls
                if age > lease_ttl_s:
                    try:
                        os.unlink(self._lease_path())  # steal abandoned lease
                    except OSError:
                        pass
                    continue
                raise RuntimeError(
                    "another reactor daemon holds the lease on "
                    f"{self.base} (age {age:.1f}s <= ttl {lease_ttl_s}s)"
                )

    def _release_lease(self) -> None:
        try:
            os.unlink(self._lease_path())
        except OSError:
            pass

    def serve(
        self,
        stop: Callable[[], bool],
        poll_interval_s: float = 0.05,
        lease_ttl_s: float = 600.0,
    ) -> tuple[int, int]:
        """Run as the propagation daemon until stop() returns True:
        acquire the lease, poll in a loop (sleeping poll_interval_s
        after idle passes only — a moving graph is drained hot), renew
        the lease heartbeat each pass, release on the way out. Returns
        (passes, nodes_moved_total). Driver-side cost per idle pass is
        file listing only; all data movement is the poll()'s Spark
        jobs."""
        import time

        self._acquire_lease(lease_ttl_s)
        passes = moved_total = 0
        try:
            while not stop():
                moved = self.poll()
                passes += 1
                moved_total += len(moved)
                os.utime(self._lease_path())  # heartbeat: lease stays fresh
                if not moved:
                    time.sleep(poll_interval_s)
            return passes, moved_total
        finally:
            self._release_lease()
