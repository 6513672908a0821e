"""Sources: deterministic replay (batch + streaming) and fixtures; the
live websocket source is a thin variant of the replay reader."""
