"""Worker for tests/test_distributed.py: one of two cooperating processes.

Encodes a shared deterministic corpus over the process-spanning mesh,
decodes it back, verifies bit-exactness, and (process 0) reports the
payload hash for comparison against the single-process encoder.
"""

import hashlib
import os
import sys


def corpus_and_params():
    import numpy as np

    from comprox_tpu.codec.block import BlockParams

    p = BlockParams(lanes=8, steps=64, mode="R", min_len=5, o3_bits=12,
                    rolz_bits=10, rolz_depth=16)
    rng = np.random.default_rng(3)
    data = rng.choice(
        np.frombuffer(b"word word fox the quick \n", np.uint8),
        p.capacity * 4 - 17,
    ).astype(np.uint8)
    return data, p


def main() -> None:
    pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    import numpy as np

    from comprox_tpu.parallel import distributed as D

    D.initialize(
        coordinator=f"localhost:{port}", num_processes=2, process_id=pid
    )
    import jax

    assert jax.process_count() == 2, "distributed bring-up failed"
    data, p = corpus_and_params()
    payloads = D.encode_file_distributed(data, p)
    ns = [
        min(p.capacity, data.size - b * p.capacity)
        for b in range(len(payloads))
    ]
    out = D.decode_file_distributed(payloads, ns, p)
    assert np.array_equal(out, data), "distributed round trip failed"
    if pid == 0:
        h = hashlib.sha256(b"".join(payloads)).hexdigest()
        with open(os.path.join(outdir, "hash.txt"), "w") as f:
            f.write(h)


if __name__ == "__main__":
    main()
