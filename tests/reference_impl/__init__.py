# Vendored THIRD-PARTY reference reconstruction — test oracle only.
# See graphsage/__init__.py for provenance. Not part of graphsage_tpu.
