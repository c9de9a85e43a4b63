# THIRD-PARTY CODE (vendored test oracle — NOT part of graphsage_tpu).
#
# Reconstruction of the public reference implementation
# `zjzijielu/graphsage-simple` ("Reference PyTorch GraphSAGE Implementation"),
# validated by execution in SURVEY.md Appendix A (the /root/reference mount
# was empty, so the reconstruction *is* the reference for this build).
# Vendored verbatim per VERDICT.md "Next round" item 2 so parity tests can run
# the reference's own code with copied weights instead of a hand-derived
# oracle. The only deliberate edit is the py3.12 shim noted in
# aggregators.py (upstream targeted py<=3.10).
#
# Upstream keeps this file empty.
