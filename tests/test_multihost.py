"""Single-host path of the multi-host runtime layer (the only path that can
execute in-sandbox; the multi-process wiring itself needs a real pod)."""

from graphsage_tpu.parallel import multihost


def test_initialize_single_host_noop():
    info = multihost.initialize()
    assert info["process_index"] == 0
    assert info["process_count"] == 1
    assert info["local_devices"] >= 1
    assert info["global_devices"] == info["local_devices"]
    # Idempotent: a second call must not try to re-wire anything.
    assert multihost.initialize() == info


def test_is_primary_single_host():
    assert multihost.is_primary()
