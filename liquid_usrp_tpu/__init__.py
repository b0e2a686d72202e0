"""liquid_usrp_tpu — a TPU-native software-radio framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
jgaeddert/liquid-usrp (reference: /root/reference): OFDM / single-carrier /
GMSK packet modems, polyphase filterbank channelizers, resamplers, FEC/CRC,
modem constellations, NCO, AGC, spectrogram — all as pure functions over
batched IQ sample blocks with explicit carried state, jittable and shardable
over TPU device meshes.

Design stance (vs. the reference's object-per-stream-operator, sample-at-a-
time, callback design — see SURVEY.md §7): every stream operator is
``step(state, block) -> (state', out)``; channels are a vmapped axis; devices
get ``(time_block, channel)`` mesh axes via ``shard_map``; halo/state exchange
uses ``ppermute``; callbacks become returned structured results.

Layering (mirrors the reference's L0-L3, SURVEY.md §1):
  - ``io``      — stream sources/sinks + channel impairments (replaces UHD, L0)
  - ``ops``     — DSP kernel library (replaces liquid-dsp, L1)
  - ``framing`` — framegen/framesync pairs (frame64/flexframe/gmsk/ofdmflex)
  - ``models``  — transceivers: ofdmtxrx, multichanneltx/rx/txrx (L2)
  - ``apps``    — CLI re-creations of the 16 reference binaries (L3)
  - ``parallel``— mesh / time-block / channel sharding + collectives
  - ``utils``   — config, timer, bit manipulation
"""

__version__ = "0.1.0"

# Restore stock-JAX semantics for the JAX_PLATFORMS environment variable:
# this image's JAX distribution ignores it and always initializes its
# bundled TPU-tunnel platform, which makes `JAX_PLATFORMS=cpu <app>`
# silently hit the (flaky) tunnel.  An explicit config.update is the only
# override that sticks (ROUND2_NOTES.md), so honor the env var here, at
# package import, before any backend is touched.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:                          # already initialized: keep
        pass
