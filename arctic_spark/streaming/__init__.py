"""Structured Streaming surface.

The reference has no streaming at all (SURVEY §2.6) — this module is the
beyond-reference mandate: every stateless `st.*` / text / dedup column
expression composes with readStream unchanged (they are ordinary Catalyst
expressions), and this module adds the stateful pieces a streaming
geo/event pipeline needs: watermarked windowed aggregation and
sessionization via ``applyInPandasWithState``.
"""

from .ops import (session_window_stats, sessionize_by_gap,
                  stream_stream_interval_join, streaming_dedup_exact,
                  streaming_near_dup_pairs, streaming_trajectories,
                  windowed_event_counts, windowed_geo_density,
                  windowed_hex_density, windowed_hll_registers,
                  windowed_cms_counters, windowed_kmv_minima,
                  windowed_sample_rows)

__all__ = ["windowed_event_counts", "windowed_geo_density",
           "windowed_hex_density", "windowed_hll_registers",
           "windowed_cms_counters", "windowed_kmv_minima",
           "windowed_sample_rows",
           "sessionize_by_gap", "session_window_stats",
           "streaming_dedup_exact", "stream_stream_interval_join",
           "streaming_near_dup_pairs", "streaming_trajectories"]
