"""Explicit StructType schemas for the engine's streaming tables.

The reference's schemas are implicit dict literals (reference
spot_trades_etl.py:48-55, spot_depth_etl.py:66-73); here every frame
and output table has a declared schema so from_json / sinks / state
operators are typed end-to-end.  Money columns are DECIMAL(38,18) —
the engine-wide policy preserving the reference's exact-decimal-string
property (spot_trades_etl.py:52-53).
"""

from __future__ import annotations

# Raw replay frame envelope (what the replay/websocket source emits).
FRAME_SCHEMA = "frame STRING, arrival_ms BIGINT, seq BIGINT"

# Binance spot trade event (reference spot_trades_etl.py:45-55).
# 'E' (event-time ms) is extracted separately: 'e'/'E' clash under
# case-insensitive field resolution, so we parse E via get_json_object.
TRADE_JSON_SCHEMA = (
    "e STRING, s STRING, t BIGINT, p STRING, q STRING, m BOOLEAN, _corrupt STRING"
)

# Binance diff-depth event (reference spot_depth_etl.py:63-73).
# 'U' (first update id) is extracted via get_json_object — 'U'/'u'
# clash under case-insensitive struct-field resolution.
DEPTH_JSON_SCHEMA = (
    "e STRING, s STRING, u BIGINT, "
    "b ARRAY<ARRAY<STRING>>, a ARRAY<ARRAY<STRING>>, _corrupt STRING"
)

DECIMAL = "decimal(38,18)"

# Output: trades table (reference README.md:70-77).
TRADES_OUT_SCHEMA = (
    "symbol STRING, timestamp BIGINT, local_timestamp BIGINT, id BIGINT, "
    f"side STRING, price {DECIMAL}, quantity {DECIMAL}"
)

# Output: depth table (reference README.md:53-60) + engine extensions
# (update_id for replay determinism, gap flag instead of crashing).
DEPTH_OUT_SCHEMA = (
    "symbol STRING, timestamp BIGINT, local_timestamp BIGINT, side STRING, "
    f"price {DECIMAL}, quantity {DECIMAL}, is_snapshot BOOLEAN, "
    "update_id BIGINT, gap BOOLEAN"
)
