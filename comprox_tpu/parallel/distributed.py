"""Multi-host runtime: jax.distributed + host-spanning mesh.

The reference has no distributed anything (single process, pthreads only —
SURVEY.md §2.5); this module provides the TPU-native scale-out path the
north star asks for: a mesh spanning all hosts of a slice, blocks sharded
data-parallel, the dictionary built once and broadcast (it rides the
archive header, so "broadcast" is just: every host reads the same header),
and file assembly by ordered gather of per-block payloads.

Collectives ride ICI within a slice and DCN across slices — expressed as
shard_map/psum over the mesh, never hand-rolled transport.

Single-host degenerate behavior is identical (process_count == 1), which is
how the 8-virtual-device CPU tests exercise this path.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up jax.distributed when running multi-host.

    No-ops when single-process (the common local case).  Arguments default
    from the standard JAX env vars, so launchers only set the environment.
    """
    import jax

    num = num_processes or int(os.environ.get("CPX_NUM_PROCESSES", "1"))
    if num <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator
        or os.environ.get("CPX_COORDINATOR", "localhost:12321"),
        num_processes=num,
        process_id=(
            process_id
            if process_id is not None
            else int(os.environ.get("CPX_PROCESS_ID", "0"))
        ),
    )


def global_mesh(axis: str = "dp"):
    """A 1-D data-parallel mesh over every device of every host."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def encode_file_distributed(data: np.ndarray, p, mesh=None) -> list[bytes]:
    """Whole-file encode over the (possibly multi-host) mesh.

    Every host holds the input (file systems are shared or replicated);
    block work shards over the global device mesh; every host computes the
    identical payload list, so host 0 (or any host) can write the archive —
    the moral equivalent of the reference's ordered fwrite loop
    (src/main.c:198-205) as an ordered gather.
    """
    from comprox_tpu.parallel.mesh import encode_blocks

    mesh = mesh or global_mesh()
    return encode_blocks(data, p, mesh)


def decode_file_distributed(payloads, ns, p, mesh=None) -> np.ndarray:
    from comprox_tpu.parallel.mesh import decode_blocks

    mesh = mesh or global_mesh()
    return decode_blocks(payloads, ns, p, mesh)
