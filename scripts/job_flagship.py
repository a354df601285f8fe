#!/usr/bin/env python
"""Flagship pipeline as a Ray job (north rule: "runs via ray job submit
on a fixed-size multi-node Ray cluster").

Cluster usage:
    ray job submit --working-dir . -- python scripts/job_flagship.py \
        --input s3://bucket/pages/ --work-dir s3://bucket/out/run1

Sandbox usage (single node):
    python scripts/job_flagship.py -i /root/testdata/sf0.001 -w /tmp/job1

The script owns its Ray session only when none exists (a job driver
inherits the cluster session from RAY_ADDRESS).  All outputs are
checkpointed parquet partitions + lineage manifest, so resubmitting the
same job after a failure resumes from completed partitions.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray

    from geo_inference_ray.pipeline import main as cli_main

    owns = not ray.is_initialized()
    if owns and "RAY_ADDRESS" not in os.environ:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    elif owns:
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 logging_level="ERROR")
    try:
        cli_main(sys.argv[1:])
    finally:
        if owns:
            ray.shutdown()


if __name__ == "__main__":
    main()
