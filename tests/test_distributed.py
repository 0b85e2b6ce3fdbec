"""Multi-host helper tests (single-process, 8 virtual CPU devices)."""

import jax

from graphsage_tpu.parallel.distributed import (
    data_graph_mesh,
    global_mesh,
    initialize_multihost,
    process_local_batch,
)


def test_global_mesh_covers_all_devices():
    mesh = global_mesh()
    assert mesh.axis_names == ("graph",)
    assert mesh.devices.size == len(jax.devices())


def test_data_graph_mesh_factorization():
    mesh = data_graph_mesh(n_graph=4)
    assert mesh.axis_names == ("data", "graph")
    assert mesh.devices.shape == (len(jax.devices()) // 4, 4)


def test_process_local_batch_single_process():
    assert process_local_batch(512) == 512


def test_initialize_multihost_noop_single_process():
    # single-process: jax.distributed.initialize raises; wrapper swallows
    initialize_multihost()
    assert jax.process_count() == 1
