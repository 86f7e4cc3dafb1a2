"""ggpm_tpu — TPU-native rebuild of the GGPM framework.

Platform-selection workaround: the axon TPU plugin monkeypatches
``jax._src.xla_bridge._get_backend_uncached`` and force-initialises the
'axon' PJRT client even when ``JAX_PLATFORMS=cpu`` is set in the
environment, so a wedged TPU tunnel hangs *CPU* runs at the first
``jax.devices()`` call (observed: ``env JAX_PLATFORMS=cpu python -c
'import jax; jax.devices()'`` blocks >60s inside ``make_c_api_client``).
``jax.config.update('jax_platforms', 'cpu')`` after import does not
trigger the hook, so mirror the env var into the config here — every
CLI, script, and test that imports the package inherits the fix
(same workaround as ``__graft_entry__._ensure_devices``).
"""

import os as _os

# Exact match only: 'tpu,cpu'-style fallback lists must keep their stated
# preference order — rewriting those to plain 'cpu' would silently run on
# CPU beside a healthy accelerator.
if _os.environ.get('JAX_PLATFORMS', '').strip() == 'cpu':
    import jax as _jax

    _jax.config.update('jax_platforms', 'cpu')
