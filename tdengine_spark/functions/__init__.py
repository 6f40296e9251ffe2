"""TDengine function-library parity as PySpark Column/DataFrame transforms.

aggregate  — twa, irate, elapsed, spread, histogram, percentile family,
             leastsquares, hyperloglog (SURVEY §2.4)
selection  — first/last/last_row, top/bottom, tail, unique, sample, mode
indef      — diff, csum, mavg, derivative, statecount, stateduration
             (the reference's indefinite-rows functions, SURVEY §2.4)
scalar     — timetruncate, to_iso8601, timediff, ... (SURVEY §2.9)
"""
