"""Shared fixed-point quanta for the events value/time arithmetic.

The streamed-equals-batch guarantee of the value-weighted twin fleet
(streaming/gapfill.py, time_rollup.py, monthly.py, value_ewma.py, ...)
holds because the stateful operator and every batch twin quantize each
event value with the IDENTICAL expression — ``floor(value *
VALUE_MICRO)`` — before the associative integer sum. A divergent
literal in any one site would silently break the fleet's bit-equality
contract (ADVICE r13 #4), so the quantum lives here, imported by both
sides (this module is import-neutral: streaming/autocorr.py imports
queries/drift.py, so neither package can host the constant for the
other).

``HOUR_NS`` is the hour bucket divisor over the events table's int64
epoch-nanosecond timestamps — the other literal both sides must share
for the state key (``ts_ns div HOUR_NS``) to line up.
"""

HOUR_NS = 3_600_000_000_000  # nanoseconds per hour (hour-bucket divisor)
VALUE_MICRO = 10_000  # fixed-point quantum for per-hour value sums
