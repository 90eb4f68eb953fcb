"""Host-resident PRNG keys.

``jax.random.PRNGKey(seed)`` dispatches a tiny threefry computation on the
default device. Through a remote-tunneled TPU that is (a) a pointless
round trip per key/split and (b) a hang if the tunnel's RNG stream
wedges — observed on this box after killing a claim mid-handshake. Keys
created here are committed to the host CPU device: splits stay local, and
jitted steps receive the key as a plain 8-byte input transfer.
"""

from __future__ import annotations

import jax


def _cpu():
    return jax.devices("cpu")[0]


def cpu_prng_key(seed: int) -> jax.Array:
    """PRNGKey computed on and committed to the host CPU device."""
    with jax.default_device(_cpu()):
        return jax.random.PRNGKey(seed)


def host_split(key: jax.Array, num: int = 2):
    """Split pinned to the host CPU device. Plain ``jax.random.split`` on
    an uncommitted key dispatches to the DEFAULT device (the tunnel), so
    every host-side split must come through here; keys auto-transfer into
    jitted device steps as ordinary 8-byte inputs."""
    with jax.default_device(_cpu()):
        return jax.random.split(key, num)
