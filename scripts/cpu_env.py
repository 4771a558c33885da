"""Import first in ad-hoc scripts to force CPU + x64 (parity mode).

Usage: `import sys; sys.path.insert(0, 'scripts'); import cpu_env  # noqa`
or run scripts with `PYTHONSTARTUP`-style exec. Tests get this via conftest.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
