"""The driver-side bucket-list ceilings are enforced bounds, not
conventions: every site that collects a layout-bounded list asserts
MAX_DRIVER_LIST (blog_parser_spark/limits.py)."""

from __future__ import annotations

import pytest

from blog_parser_spark.limits import MAX_DRIVER_LIST, check_driver_list_bound


def test_bound_check_raises_past_ceiling():
    check_driver_list_bound(MAX_DRIVER_LIST, "n_buckets")  # at the edge: ok
    with pytest.raises(AssertionError, match="MAX_DRIVER_LIST"):
        check_driver_list_bound(MAX_DRIVER_LIST + 1, "n_buckets")


def test_streaming_entrypoints_enforce_bound():
    from blog_parser_spark.streaming import stream
    with pytest.raises(AssertionError, match="MAX_DRIVER_LIST"):
        stream.start_inverted_index(None, "/tmp/x", "/tmp/y",
                                    n_buckets=MAX_DRIVER_LIST + 1)
    with pytest.raises(AssertionError, match="MAX_DRIVER_LIST"):
        stream.start_cdc_snapshot(None, "/tmp/x", "/tmp/y", key_col="k",
                                  n_buckets=MAX_DRIVER_LIST + 1)
