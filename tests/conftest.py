"""Test configuration: force a virtual 8-device CPU mesh (SURVEY.md §4,
"multi-host without a cluster").

The environment's sitecustomize registers the axon TPU backend at
interpreter start (before this file can run), which pins jax to the one
real chip. To get the CPU mesh we re-exec pytest once with the axon pool
disabled. Set LQR_TESTS_ON_TPU=1 to skip that and run tests on the chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU backend at
# interpreter start and pins JAX_PLATFORMS=axon; backends initialize
# lazily, so overriding the platform here (before any device use) still
# lands us on the 8-device virtual CPU mesh. LQR_TESTS_ON_TPU=1 opts back
# into running tests on the real chip.
if not os.environ.get("LQR_TESTS_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache — compiles are ~8s each on this small host;
# the cache makes test reruns fast.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


@pytest.fixture(autouse=True)
def _fresh_executable_arena(request):
    """Clear the in-memory executable caches at each module boundary.

    XLA:CPU's compiler segfaults once a long pytest process has
    accumulated enough Mosaic-interpret executables (the crash lands in
    backend_compile_and_load / compilation_cache.get_executable_and_time).
    Per-module clearing in conftest makes the mitigation independent of
    file ordering (ADVICE r4: subset runs like `-k`, `--lf`, or explicit
    two-file invocations crashed when the clearing lived inside one
    module).  The persistent disk cache keeps recompiles cheap."""
    mod = request.node.nodeid.split("::", 1)[0]
    if mod != getattr(_fresh_executable_arena, "_last", None):
        _fresh_executable_arena._last = mod
        jax.clear_caches()
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def random_image(rng, h, w, c, smooth=True):
    """A mildly smooth random uint8 image (smoothness gives non-degenerate
    seam structure; pure noise makes every seam equally bad)."""
    img = rng.integers(0, 256, (h, w, c)).astype(np.float32)
    if smooth:
        for _ in range(2):
            img = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1)
                   + np.roll(img, -1, 0) + np.roll(img, -1, 1)) / 5.0
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.fixture
def make_image(rng):
    def _make(h=24, w=32, c=3, smooth=True):
        return random_image(rng, h, w, c, smooth)
    return _make
