"""Backend/runner registry + routed execution.

Parity with the reference's runner management and per-machine
dispatch:

- ``register-runner`` (/root/reference/Yuki/server/routes/runner.py:46)
  registers a named runner with a url/token and a ``backend_type``;
  ``runners`` lists them, ``remove-runner`` deletes one, and
  ``runner-connection`` (runner.py:30) probes liveness. Here
  :class:`BackendRegistry` holds named backends with the same
  metadata surface.
- ``run/<project>/<impression>/<machine>``
  (/root/reference/Yuki/server/routes/execution.py:103) runs one job
  on one named machine, dispatched async (Celery) with a pollable run
  id. Here :meth:`BackendRegistry.run` routes each task to the
  backend named by ``Task.runner`` (default runner otherwise), and
  :meth:`BackendRegistry.run_async` returns the pollable
  :class:`~yuki_spark.pipeline.backends.AsyncRun` handle.

The Spark-native meaning of "machines": each backend owns a session
(:meth:`LocalBackend.session_for`) — the caller's session for the
local runner, an isolated/new session (or a Spark-Connect remote) for
:class:`~yuki_spark.pipeline.backends.RemoteSessionBackend`. Data
crosses runner boundaries only through the shared
:class:`~yuki_spark.pipeline.impressions.ImpressionStore`: the routed
run persists every task whose consumer lives on a different runner
(impressions are how the reference moves job outputs between machines
too), and the consumer's backend reads the deposit back on ITS
session. At cluster scale this is exactly "stage the intermediate to
shared storage, continue on another cluster" — no session state ever
needs to be shippable.
"""
from __future__ import annotations

import hashlib
import uuid
from typing import Any

from pyspark.sql import SparkSession

from .backends import AsyncRun, LocalBackend
from .dag import Pipeline


class UnknownRunnerError(KeyError):
    """A task routed to a runner name that was never registered."""


class BackendRegistry:
    """Named runners → execution backends, plus the routed run."""

    def __init__(self, store=None):
        # shared store is the inter-runner data plane; optional only
        # for single-runner registries (routing across runners
        # requires it)
        self.store = store
        self._runners: dict[str, dict[str, Any]] = {}

    # -- registration surface (runner.py parity) ----------------------

    def register(
        self,
        name: str,
        backend: LocalBackend,
        backend_type: str = "local",
        url: str | None = None,
        token: str | None = None,
    ) -> str:
        """Register a named runner; returns its generated runner id
        (parity: register-runner stores runner → uuid → url/token/
        backend_type). Tokens are never stored in the clear — only a
        sha256 digest, enough to re-verify a presented token. A
        backend used for cross-runner routing must share the
        registry's store (that is the only data path between
        runners)."""
        if name in self._runners:
            raise ValueError(f"runner {name!r} already registered")
        if not isinstance(backend, LocalBackend):
            raise TypeError(
                f"runner {name!r}: backend must be a LocalBackend family "
                f"instance (got {type(backend).__name__})"
            )
        if self.store is not None:
            if backend.store is None:
                backend.store = self.store
            elif backend.store.root != self.store.root:
                raise ValueError(
                    f"runner {name!r}: backend store {backend.store.root!r} "
                    f"differs from registry store {self.store.root!r} — "
                    "routed tasks exchange data through ONE shared store"
                )
        rid = uuid.uuid4().hex
        self._runners[name] = {
            "id": rid,
            "backend": backend,
            "backend_type": backend_type,
            "url": url,
            "token_sha256": (
                hashlib.sha256(token.encode()).hexdigest() if token else None
            ),
        }
        return rid

    def runners(self) -> list[str]:
        """Registered runner names (parity: the ``runners`` route)."""
        return sorted(self._runners)

    def remove(self, name: str) -> None:
        if name not in self._runners:
            raise UnknownRunnerError(name)
        del self._runners[name]

    def backend_for(self, name: str) -> LocalBackend:
        try:
            return self._runners[name]["backend"]
        except KeyError:
            raise UnknownRunnerError(
                f"runner {name!r} is not registered "
                f"(registered: {self.runners()})"
            ) from None

    def info(self, name: str) -> dict[str, Any]:
        """Runner metadata minus the backend object (runners-url
        parity)."""
        r = self._runners.get(name)
        if r is None:
            raise UnknownRunnerError(name)
        return {k: v for k, v in r.items() if k != "backend"}

    def connection(self, name: str) -> dict[str, str]:
        """Liveness probe (parity: runner-connection — non-remote
        backend types short-circuit to Connected, remote ones ping)."""
        b = self.backend_for(name)
        probe = getattr(b, "connection", None)
        return probe() if callable(probe) else {"status": "Connected"}

    # -- routed execution (execution.py run-on-machine parity) --------

    def _resolve(self, pipe: Pipeline, default_runner: str) -> dict[str, str]:
        """task name → runner name; unknown runners fail BEFORE any
        task executes (a half-run pipeline is worse than an error)."""
        routing: dict[str, str] = {}
        for n, t in pipe.tasks.items():
            runner = t.runner or default_runner
            self.backend_for(runner)  # raises UnknownRunnerError
            routing[n] = runner
        return routing

    def run(
        self, spark: SparkSession, pipe: Pipeline, default_runner: str
    ) -> dict[str, Any]:
        """Execute the pipeline with each task on its named runner's
        backend. Tasks consumed by a different runner are force-
        persisted through the shared store; the consumer re-reads the
        deposit on its own backend's session. Statuses roll up on the
        shared Pipeline object exactly as in a single-backend run."""
        routing = self._resolve(pipe, default_runner)
        cross = {
            d
            for t in pipe.tasks.values()
            for d in t.deps
            if routing[d] != routing[t.name]
        }
        if cross and self.store is None:
            raise ValueError(
                "routing across runners requires a shared store "
                f"(boundary tasks: {sorted(cross)})"
            )
        order = pipe.topo_order()
        for n in order:
            pipe.tasks[n].status = "waiting"
        results: dict[str, Any] = {}
        imp_ids: dict[str, str] = {}
        pending_obs: dict[str, Any] = {}
        explains: dict[str, str] = {}
        for name in order:
            t = pipe.tasks[name]
            backend = self.backend_for(routing[name])
            session = backend.session_for(spark)
            # swap cross-runner inputs for store reads bound to THIS
            # backend's session — a foreign session's DataFrame is not
            # a valid plan fragment here. A boundary dep that ran but
            # did NOT deposit (its address is archived, so _run_one
            # neither reused nor rewrote it — status 'compiled') must
            # fail LOUD: silently passing the producer session's
            # DataFrame across the runner boundary is exactly the
            # invalid state this layer exists to prevent.
            local = dict(results)
            for d in t.deps:
                if routing[d] != routing[name] and d in imp_ids:
                    if pipe.tasks[d].status in ("finished", "reused"):
                        local[d] = self.store.read(session, imp_ids[d])
                    elif pipe.tasks[d].status == "compiled":
                        raise RuntimeError(
                            f"routed run: boundary task {d!r} (runner "
                            f"{routing[d]!r}) produced no readable deposit "
                            f"at {imp_ids[d]} — unarchive it or bump the "
                            f"task version so a fresh deposit is written"
                        )
            backend.run_task(
                spark,
                pipe,
                name,
                local,
                imp_ids,
                pending_obs,
                explains,
                force_persist=name in cross,
            )
            if name in local:
                results[name] = local[name]
        anchor = self.backend_for(default_runner)
        out = anchor._finalize(
            spark, pipe, order, results, imp_ids, pending_obs, explains
        )
        out["routing"] = routing
        return out

    def run_async(
        self, spark: SparkSession, pipe: Pipeline, default_runner: str
    ) -> AsyncRun:
        """Dispatch a routed run in a background thread and return the
        pollable handle (parity: the run route returns a Celery task
        id and clients poll status — execution.py:103)."""
        import threading

        handle = AsyncRun(pipe, self)
        self._resolve(pipe, default_runner)  # fail fast, pre-dispatch

        def _target() -> None:
            try:
                handle._result = self.run(spark, pipe, default_runner)
            except BaseException as e:  # noqa: BLE001 — surface via join()
                handle._error = e

        t = threading.Thread(
            target=_target, name=f"routed-{pipe.name}", daemon=True
        )
        handle._thread = t
        t.start()
        return handle

    def kill(self, pipe: Pipeline) -> None:
        """Kill the pipeline on every registered backend (sticky per
        pipeline, exactly like a single backend's kill)."""
        for r in self._runners.values():
            r["backend"].kill(pipe)
