# Minimal lxml stand-in backed by the Python stdlib, providing exactly the
# API surface the reference dump pipeline uses (iterparse/parse/ElementPath).
# Exists only so the *unmodified* reference CLI can run in this offline
# sandbox to produce byte-parity goldens. Not a general lxml replacement.
