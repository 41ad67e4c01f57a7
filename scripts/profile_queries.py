"""Profile every __ray_entry__.queries() entry at a given sf_dir,
mimicking the driver: ray.init once, run entries in dict order, print
per-entry wall seconds + cumulative. Usage:

    python scripts/profile_queries.py [sf_dir] [only_prefix...]
"""

import sys
import time

import ray

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)
    import __ray_entry__ as e

    qs = e.queries()
    total = 0.0
    for name, fn in qs.items():
        if only and not any(name.startswith(p) for p in only):
            continue
        t0 = time.perf_counter()
        err = ""
        try:
            res = fn(sf_dir)
            # materialize like the driver would
            if hasattr(res, "to_pandas"):
                res = res.to_pandas()
            n = len(res)
        except Exception as ex:  # noqa: BLE001
            n, err = -1, f"{type(ex).__name__}: {ex}"[:120]
        dt = time.perf_counter() - t0
        total += dt
        print(f"{name:32s} {dt:8.2f}s  rows={n:>8}  cum={total:8.1f}s {err}")
        sys.stdout.flush()
    ray.shutdown()


if __name__ == "__main__":
    main()
