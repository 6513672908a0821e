"""Engine scalar/aggregate function helpers (all JVM-side built-ins)."""
