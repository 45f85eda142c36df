import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Install the fsspec-http stub before any test thread touches Ray Data:
# the all-parity gate checks queries from 4 driver threads, and Ray's
# per-read retried `from fsspec.implementations.http import ...` (aiohttp
# is absent here) races across threads — see _stub_fsspec_http.
import layout_analysis_ray  # noqa: E402,F401


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    # Ray 2.49 sizes each join/shuffle aggregator ACTOR pool at
    # min(num_partitions, cluster_CPUs / 2) CPUs (hash_shuffle.py
    # _get_aggregator_num_cpus_per_partition).  Two join-bearing queries
    # executing concurrently therefore pin ALL 4 test-session CPUs in
    # actors and starve every task — the 4-thread all-parity gate
    # deadlocked exactly this way (q3_top_orders + cust_yoy_activity in
    # flight, every executor alive but no task able to run).  Near-zero
    # per-partition CPU keeps the pools schedulable alongside tasks; the
    # aggregators are memory/concat-bound so correctness and small-scale
    # throughput are unaffected.  Production defaults are untouched —
    # this is a test-session setting (bench runs queries sequentially).
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.join_operator_actor_num_cpus_per_partition_override = 0.01
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.01
    yield ray
    ray.shutdown()
