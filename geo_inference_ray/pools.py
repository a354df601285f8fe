"""Actor-pool sizing + per-process parquet spill scratch.

``pool_caps`` replaces the hard-coded ``concurrency=(1, 4)`` caps in the
dedup / multimodal / ANN query wrappers: the upper bound now scales with
the session's CPU count by default (a fixed cap of 4 pins the most
compute-heavy stages at 4 workers on a 256-node cluster), while the
lower bound stays 1 so narrow sessions (2-CPU canary tests) never
deadlock on idle pool reservations.

``spill_dir`` replaces ad-hoc ``tempfile.mkdtemp(dir="/tmp")`` scratch:
spills live under ``<tmp>/geo_inference_ray_spill/pid<NNN>/``, the whole
per-process tree is removed at interpreter exit, and dirs left behind by
dead processes (crashed runs) are swept on first use — so repeated
bench/compare runs no longer grow /tmp without bound.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

POOL_FLOOR = 2      # never cap a pool below this many actors
POOL_RESERVE = 1    # CPUs left for the read / downstream tasks


def pool_caps(max_actors: int | None = None) -> tuple[int, int]:
    """(min, max) actor-pool concurrency for ``map_batches``.

    Explicit ``max_actors`` wins; otherwise the cap is
    ``max(POOL_FLOOR, session CPUs - POOL_RESERVE)`` so pools scale with
    the cluster instead of a hard-coded constant.  The minimum is always
    1: pools pin one CPU while idle, and a larger floor deadlocks
    narrow sessions (see shuffle.add_salt docstring).
    """
    if max_actors is None:
        cpus = 4.0
        try:
            import ray

            if ray.is_initialized():
                cpus = float(ray.cluster_resources().get("CPU", 4.0))
        except Exception:
            pass
        max_actors = max(POOL_FLOOR, int(cpus) - POOL_RESERVE)
    return (1, max(1, int(max_actors)))


_SPILL_ROOTS: dict[str, str] = {}
_SPILL_SEQ = 0


def _sweep_dead(base: str) -> None:
    """Remove pid-tagged spill trees whose owning process is gone."""
    try:
        names = os.listdir(base)
    except OSError:
        return
    for name in names:
        if not name.startswith("pid"):
            continue
        try:
            pid = int(name[3:])
        except ValueError:
            continue
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)  # liveness probe only
        except ProcessLookupError:
            shutil.rmtree(os.path.join(base, name), ignore_errors=True)
        except PermissionError:
            pass  # alive under another user — leave it


def spill_dir(tag: str, work_dir: str | None = None) -> str:
    """Fresh scratch dir for a parquet spill, auto-removed at process
    exit (atexit on the per-pid tree) and swept if this process dies
    without running atexit (next process' dead-pid sweep)."""
    global _SPILL_SEQ

    base = os.path.join(work_dir or tempfile.gettempdir(),
                        "geo_inference_ray_spill")
    root = _SPILL_ROOTS.get(base)
    if root is None:
        os.makedirs(base, exist_ok=True)
        _sweep_dead(base)
        root = os.path.join(base, f"pid{os.getpid()}")
        os.makedirs(root, exist_ok=True)
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _SPILL_ROOTS[base] = root
    _SPILL_SEQ += 1
    d = os.path.join(root, f"{tag}_{_SPILL_SEQ:04d}")
    os.makedirs(d)
    return d
