"""Megakernel decode vs the XLA scan path (greedy tokens must match exactly).

Runs in Pallas interpret mode on CPU; the compiled kernel is validated on
real TPU hardware (100% greedy agreement at 48 steps, and it is the engine
behind bench.py's headline number).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composer_tpu.models import ModelType
from composer_tpu.models.transformer import Transformer, TransformerConfig, init_cache
from composer_tpu.ops import decode_kernel as dk
from composer_tpu.train.generate import generate_ids


def _setup(use_relative=False):
    config = TransformerConfig(
        vocab_size=390, embed_dim=64, window_size=64, num_layers=2,
        num_heads=4, use_relative_attention=use_relative,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        initializer_stddev=0.3,  # varied logits so greedy decoding is non-trivial
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    model = Transformer(config)
    params = model.init_params(jax.random.PRNGKey(0), 1, 8)
    return config, model, params


@pytest.fixture(scope="module")
def setup():
    return _setup()


@pytest.mark.parametrize("use_relative", [False, True])
def test_megakernel_matches_xla_greedy(use_relative):
    config, model, params = _setup(use_relative)
    prompt = np.array([[5, 100, 300, 17]], np.int32)
    steps = 12

    xla_out = generate_ids(
        model, ModelType.TRANSFORMER, params, prompt,
        length=steps + 1, temperature=0.0, seed=0, engine="xla",
    )
    t1 = int(xla_out[0, prompt.shape[1]])
    expected = np.asarray(xla_out[0, prompt.shape[1] + 1 :])

    cache_len = 128
    cache = init_cache(config, 1, cache_len, dtype=jnp.float32)
    _, cache = model.apply({"params": params}, jnp.asarray(prompt), cache)
    packed = dk.pack_weights(params, config, dtype=jnp.float32)
    k_rows, v_rows = dk.cache_to_rows(cache, config, cache_len, dtype=jnp.float32)

    tokens = dk.megakernel_decode(
        packed, k_rows, v_rows,
        start_pos=prompt.shape[1], token0=t1, seed=0, temperature=0.0,
        config=config, num_steps=steps, cache_len=cache_len, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(tokens), expected)
    # Varied-token sanity: the sequence must not be a single repeated token.
    assert len(set(expected.tolist())) > 1


def test_pack_weights_shapes(setup):
    config, model, params = setup
    packed = dk.pack_weights(params, config)
    assert packed["wte"].shape[0] % 256 == 0
    assert packed["wte_t"].shape == (config.embed_dim, packed["wte"].shape[0])
    assert packed["qkv_w"].shape == (
        config.num_layers, config.embed_dim, 3 * config.embed_dim,
    )


def test_cache_to_rows_layout(setup):
    config, model, params = setup
    cache = init_cache(config, 1, 16, dtype=jnp.float32)
    prompt = jnp.asarray([[1, 2, 3]], jnp.int32)
    _, cache = model.apply({"params": params}, prompt, cache)
    k_rows, v_rows = dk.cache_to_rows(cache, config, 32, dtype=jnp.float32)
    assert k_rows.shape == (config.num_layers, 32, config.embed_dim)
    # Row p lane h*D+d must equal cache[l]['k'][0, h, p, d].
    k_cache = np.asarray(cache["layers"][0]["k"])[0]  # (H, C, D)
    for p in range(3):
        for h in range(config.num_heads):
            np.testing.assert_allclose(
                np.asarray(k_rows[0, p, h * config.head_dim : (h + 1) * config.head_dim]),
                k_cache[h, p],
                rtol=1e-6,
            )


@pytest.mark.parametrize("use_relative", [False, True])
def test_full_kernel_generation_matches_xla_greedy(use_relative):
    """The prefill-free kernel (teacher-forced prompt) equals the XLA path."""
    config, model, params = _setup(use_relative)
    prompt = np.array([5, 100, 300, 17], np.int32)
    length = 12

    xla_out = generate_ids(
        model, ModelType.TRANSFORMER, params, prompt[None],
        length=length, temperature=0.0, seed=0, engine="xla",
    )
    expected = np.asarray(xla_out[0, len(prompt):])

    packed = dk.pack_weights(params, config, dtype=jnp.float32)
    tokens = dk.megakernel_generate(
        packed, prompt, seed=0, temperature=0.0,
        config=config, length=length, cache_len=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(tokens), expected)


@pytest.mark.parametrize("use_relative", [False, True])
def test_batched_kernel_matches_xla_greedy(use_relative):
    from composer_tpu.ops.decode_kernel_batched import megakernel_generate_batched

    config, model, params = _setup(use_relative)
    prompts = np.array([[5, 100, 300, 17], [9, 42, 7, 250], [1, 2, 3, 4]], np.int32)
    length = 10

    expected = np.asarray(
        generate_ids(
            model, ModelType.TRANSFORMER, params, prompts,
            length=length, temperature=0.0, seed=0, engine="xla",
        )
    )[:, prompts.shape[1]:]

    packed = dk.pack_weights(params, config, dtype=jnp.float32)
    out = megakernel_generate_batched(
        packed, prompts, 0, 0.0,
        config=config, length=length, cache_len=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), expected)


@pytest.mark.parametrize("use_relative", [False, True])
def test_batched_kernel_lanestacked_matches_xla_greedy(use_relative, monkeypatch):
    """The lane-stacked KV layout (COMPOSER_DECODE_LANESTACK=1, one append
    slab per buffer) must stay greedy-identical — it is off by default
    (measured slower on v5e-1) but remains a supported A/B knob."""
    from composer_tpu.ops import decode_kernel_batched as dkb

    monkeypatch.setattr(dkb, "_LANESTACK", True)
    config = TransformerConfig(
        vocab_size=390, embed_dim=128, window_size=64, num_layers=2,
        num_heads=4, use_relative_attention=use_relative,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        initializer_stddev=0.3, dtype=jnp.float32, param_dtype=jnp.float32,
    )
    assert config.embed_dim % 128 == 0
    model = Transformer(config)
    params = model.init_params(jax.random.PRNGKey(0), 1, 8)
    prompts = np.array([[5, 100, 300, 17], [9, 42, 7, 250], [1, 2, 3, 4]], np.int32)
    length = 10

    expected = np.asarray(
        generate_ids(
            model, ModelType.TRANSFORMER, params, prompts,
            length=length, temperature=0.0, seed=0, engine="xla",
        )
    )[:, prompts.shape[1]:]

    packed = dk.pack_weights(params, config, dtype=jnp.float32)
    out = dkb.megakernel_generate_batched(
        packed, prompts, 0, 0.0,
        config=config, length=length, cache_len=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), expected)
    assert len(set(np.asarray(out).ravel().tolist())) > 1


def test_long_generation_matches_xla_greedy():
    """A multi-hundred-step generation across several KV slab boundaries
    (and past the learned window) stays greedy-identical to the XLA path —
    both kernels. The batched kernel's loop runs as staged segments here
    (cache 384 -> stage edges at each 128 rows), so this also pins carry
    continuity across segment boundaries; the single-sequence kernel is
    unstaged by design (see TODO.md for the measured A/B matrix)."""
    from composer_tpu.ops.decode_kernel_batched import megakernel_generate_batched

    config, model, params = _setup()
    prompt = np.array([5, 100, 300, 17], np.int32)
    length = 140  # prompt 4 + 140 -> 143 steps across several 16-row slabs
    cache_len = 384

    xla_out = generate_ids(
        model, ModelType.TRANSFORMER, params, prompt[None],
        length=length, temperature=0.0, seed=0, engine="xla",
        cache_len=cache_len,
    )
    expected = np.asarray(xla_out[0, len(prompt):])

    packed = dk.pack_weights(params, config, dtype=jnp.float32)
    tokens = dk.megakernel_generate(
        packed, prompt, seed=0, temperature=0.0,
        config=config, length=length, cache_len=cache_len, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(tokens), expected)
    assert len(set(expected.tolist())) > 1

    prompts = np.stack([prompt, prompt[::-1].copy()])
    expected_b = np.asarray(
        generate_ids(
            model, ModelType.TRANSFORMER, params, prompts,
            length=length, temperature=0.0, seed=0, engine="xla",
            cache_len=cache_len,
        )
    )[:, prompts.shape[1]:]
    out = megakernel_generate_batched(
        packed, prompts, 0, 0.0,
        config=config, length=length, cache_len=cache_len, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), expected_b)


def test_chunked_engine_splits_large_batches(setup):
    """Batches beyond one kernel's VMEM run as sequential fused dispatches:
    the engine slices the prompt batch, seeds each chunk differently, and
    reassembles outputs in order."""
    from composer_tpu.train import generate as gen

    config, model, params = setup
    engine = gen.TransformerDecoder(model, params, dtype=jnp.float32)

    calls = []

    def fake_pipeline(packed, prompt, plens, seed, temps, topks, topps,
                      krows, vrows, cache_len, length, greedy, use_k, use_p,
                      ragged, start):
        calls.append((prompt.shape[0], int(seed)))
        assert not ragged  # equal-width prompts take the fixed-length path
        assert start == 0  # 4-token prompts never trigger parallel prefill
        # Tag outputs with the seed so ordering is checkable.
        return jnp.full((prompt.shape[0], length), seed, jnp.int32)

    engine._pipeline = fake_pipeline
    prompts = jnp.tile(jnp.arange(4, dtype=jnp.int32)[None], (19, 1))
    out = engine.generate(prompts, length=6, temperature=0.0, seed=100)

    assert out.shape == (19, 6)
    chunk = gen._megakernel_chunk(config, 19, 128)
    assert [c[0] for c in calls] == [chunk] * (19 // chunk) + (
        [19 % chunk] if 19 % chunk else []
    )
    # Chunk 0 keeps the user seed (single-dispatch behaviour unchanged);
    # later chunks land in a band disjoint from small user seeds so seed
    # sweeps can never collide with another call's chunk streams.
    expected_seeds = [100] + [
        (100 * 65537 + 2**16 + index) % (2**31) for index in range(1, len(calls))
    ]
    assert all(s >= 2**16 for s in expected_seeds[1:])
    assert [c[1] for c in calls] == expected_seeds
    assert len(set(expected_seeds)) == len(expected_seeds)
    np.testing.assert_array_equal(
        np.asarray(out[:, 0]),
        np.repeat(expected_seeds, [c[0] for c in calls]),
    )


def test_use_megakernel_allows_large_batches():
    from composer_tpu.train import generate as gen

    config, model, params = _setup()
    # 64 sequences at a small cache: chunkable, so the fused engine applies.
    assert gen._megakernel_chunk(config, 64, 256) == 8
    assert gen._use_megakernel(model, ModelType.TRANSFORMER, 64, 256, "megakernel")
    # An enormous cache that cannot even fit one sequence falls back.
    assert gen._megakernel_chunk(config, 4, 40_000_000) == 0
    assert not gen._use_megakernel(model, ModelType.TRANSFORMER, 4, 40_000_000, "megakernel")


def test_vmem_gate_counts_packed_weights():
    """Wide models whose packed weights alone overflow VMEM must be routed
    to the XLA scan path even at batch 1 / short caches (an embed-1024
    model is ~200MB of resident kernel weights — the 2026-08-19 validation
    run OOMed at compile time when the gate only counted KV bytes)."""
    from composer_tpu.train import generate as gen

    wide = TransformerConfig(
        vocab_size=390, embed_dim=1024, window_size=2048, num_layers=8,
        num_heads=16,
    )
    assert gen._packed_weight_bytes(wide) > 128 * 1024 * 1024
    assert gen._megakernel_chunk(wide, 1, 128) == 0
    model = Transformer(wide)
    assert not gen._use_megakernel(model, ModelType.TRANSFORMER, 1, 640, "megakernel")

    # The reference arch (embed 256) still fits at the serving shape:
    # 8 rows x 1152-cache — the round-2 serving benches must keep routing
    # through the fused engine.
    ref = TransformerConfig(
        vocab_size=390, embed_dim=256, window_size=2048, num_layers=8,
        num_heads=16,
    )
    assert gen._packed_weight_bytes(ref) < 20 * 1024 * 1024
    assert gen._megakernel_chunk(ref, 8, 1152) == 8


def test_vmem_gate_matches_engine_padding(setup):
    """The engine pads cache_len to 128; the routing gate must apply the
    same padding, or requests in the 127-wide band just below a chunk-size
    boundary get routed to the fused engine only to be rejected by it."""
    from composer_tpu.train import generate as gen

    config, model, params = setup
    for raw_len in range(100, 50_000, 997):
        if gen._use_megakernel(model, ModelType.TRANSFORMER, 4, raw_len, "megakernel"):
            padded = gen._padded_cache_len(raw_len)
            assert gen._megakernel_chunk(config, 4, padded) > 0, raw_len


@pytest.mark.parametrize("use_relative", [False, True])
def test_generation_past_window_matches_xla_greedy(use_relative):
    """Decoding past window_size: positions clamp to the last learned
    embedding and relative distances beyond the table contribute zero bias.
    The XLA path used to misalign the rel bias here (clamped slice start),
    so this pins kernel/XLA agreement in exactly that regime."""
    config = TransformerConfig(
        vocab_size=390, embed_dim=64, window_size=16, num_layers=2,
        num_heads=4, use_relative_attention=use_relative,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        initializer_stddev=0.3, dtype=jnp.float32, param_dtype=jnp.float32,
    )
    model = Transformer(config)
    params = model.init_params(jax.random.PRNGKey(0), 1, 8)
    prompt = np.array([5, 100, 300, 17], np.int32)
    length = 28  # prompt 4 + 28 = 32 positions, twice the window

    xla_out = generate_ids(
        model, ModelType.TRANSFORMER, params, prompt[None],
        length=length, temperature=0.0, seed=0, engine="xla",
    )
    expected = np.asarray(xla_out[0, len(prompt):])

    packed = dk.pack_weights(params, config, dtype=jnp.float32)
    tokens = dk.megakernel_generate(
        packed, prompt, seed=0, temperature=0.0,
        config=config, length=length, cache_len=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(tokens), expected)
    assert len(set(expected.tolist())) > 1


class TestInKernelSamplingFilters:
    """Top-k / nucleus filtering inside the fused kernels
    (ops/decode_kernel.py::_filtered_scaled_logits)."""

    def _rows(self, rng, n=3, vocab=390, vpad=512):
        x = rng.normal(0.0, 3.0, (n, vpad)).astype(np.float32)
        x[:, vocab:] = dk.NEG_INF  # padding lanes, like the kernel's logits_b
        return jnp.asarray(x)

    @staticmethod
    def _kept(filtered):
        return np.asarray(filtered) > dk.NEG_INF / 2

    def test_top_k_mask_matches_xla_filter(self, rng):
        from composer_tpu.ops import sampling

        x = self._rows(rng)
        for k in (1, 5, 40, 390, 512):
            ours = self._kept(dk._filtered_scaled_logits(x, k, 0.0, jnp.float32))
            ref = np.asarray(sampling.filter_top_k(x, min(k, 512))) > dk.NEG_INF / 2
            np.testing.assert_array_equal(ours, ref, err_msg=f"k={k}")

    def test_top_p_mask_matches_xla_filter(self, rng):
        from composer_tpu.ops import sampling

        # Masses are f32 on both sides but accumulate in different orders
        # (sorted cumsum vs MXU dot tree), so masks may legitimately differ
        # for tokens whose strict mass-before sits within float noise of p.
        x = self._rows(rng)
        xf = np.asarray(x).astype(np.float64)
        e = np.exp(xf - xf.max(axis=1, keepdims=True))
        probs = e / e.sum(axis=1, keepdims=True)
        for p in (0.1, 0.5, 0.9, 0.99):
            ours = self._kept(dk._filtered_scaled_logits(x, 0, p, jnp.float32))
            ref = np.isfinite(np.asarray(sampling.filter_top_p(x, p)))
            mass_before = (probs[:, None, :] * (xf[:, None, :] > xf[:, :, None])).sum(-1)
            boundary = np.abs(mass_before - p) < 1e-4
            disagree = ours != ref
            assert not (disagree & ~boundary).any(), f"p={p}"
            # And never off by much: kept-count difference bounded by the
            # number of boundary tokens.
            assert (np.abs(ours.sum(1) - ref.sum(1)) <= boundary.sum(1)).all()

    def test_combined_filters_compose(self, rng):
        from composer_tpu.ops import sampling

        x = self._rows(rng)
        ours = self._kept(dk._filtered_scaled_logits(x, 20, 0.8, jnp.float32))
        # XLA order: top-k first, then nucleus over survivors. The kernel
        # computes both thresholds on the UNFILTERED row — for the nucleus
        # this matches because dropping non-top-k tokens only removes mass
        # STRICTLY BELOW any surviving token, never mass above it...
        # except it renormalizes. Compare against the kernel's own
        # definition: survives iff rank < k AND strict-mass-before < p on
        # the unfiltered distribution; assert it is a SUBSET of top-k and a
        # SUPERSET of XLA's composed filter intersected with top-k.
        topk_only = self._kept(dk._filtered_scaled_logits(x, 20, 0.0, jnp.float32))
        xla = np.isfinite(
            np.asarray(
                sampling.filter_top_p(sampling.filter_top_k(x, 20), 0.8)
            )
        )
        assert (ours <= topk_only).all()
        assert (xla <= topk_only).all()
        # Argmax always survives everywhere.
        best = np.asarray(jnp.argmax(x, axis=1))
        for row in range(x.shape[0]):
            assert ours[row, best[row]] and xla[row, best[row]]

    def test_greedy_generation_invariant_under_filters(self):
        """Filters keep the argmax, so greedy tokens are unchanged — this
        runs the filter code INSIDE both kernels under interpret mode (the
        sampled branch needs the on-core PRNG, which interpret lacks)."""
        from composer_tpu.ops.decode_kernel_batched import megakernel_generate_batched

        config, model, params = _setup()
        packed = dk.pack_weights(params, config, dtype=jnp.float32)
        prompt = np.array([5, 100, 300, 17], np.int32)

        plain = dk.megakernel_generate(
            packed, prompt, seed=0, temperature=0.0,
            config=config, length=10, cache_len=128, interpret=True,
        )
        filt = dk.megakernel_generate(
            packed, prompt, seed=0, temperature=0.0,
            config=config, length=10, cache_len=128, interpret=True,
            top_k=5, top_p=0.9,
        )
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(filt))

        prompts = np.stack([prompt, prompt[::-1].copy()])
        plain_b = megakernel_generate_batched(
            packed, prompts, 0, 0.0,
            config=config, length=10, cache_len=128, interpret=True,
        )
        filt_b = megakernel_generate_batched(
            packed, prompts, 0, 0.0,
            config=config, length=10, cache_len=128, interpret=True,
            top_k=5, top_p=0.9,
        )
        np.testing.assert_array_equal(np.asarray(plain_b), np.asarray(filt_b))

    def test_per_row_filters_greedy_invariant(self):
        """Per-row threshold vectors (mixed batches) wire through the batched
        kernel's SMEM scalars: greedy tokens are unchanged by any per-row
        filter mix, and rows with filters disabled ride the always-true
        sentinels (vocab-rank / mass-before) without effect."""
        from composer_tpu.ops.decode_kernel_batched import megakernel_generate_batched

        config, model, params = _setup()
        packed = dk.pack_weights(params, config, dtype=jnp.float32)
        prompt = np.array([5, 100, 300, 17], np.int32)
        prompts = np.stack([prompt, prompt[::-1].copy(), prompt + 1])

        plain = megakernel_generate_batched(
            packed, prompts, 0, 0.0,
            config=config, length=10, cache_len=128, interpret=True,
        )
        mixed = megakernel_generate_batched(
            packed, prompts, 0, np.zeros((3,), np.float32),
            config=config, length=10, cache_len=128, interpret=True,
            top_k=np.array([5, 0, 64], np.int32),
            top_p=np.array([0.0, 0.9, 0.5], np.float32),
        )
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(mixed))

        # Single-sequence kernel: dynamic scalar thresholds, same invariance.
        solo_plain = dk.megakernel_generate(
            packed, prompt, seed=0, temperature=0.0,
            config=config, length=10, cache_len=128, interpret=True,
        )
        solo_filt = dk.megakernel_generate(
            packed, prompt, seed=0, temperature=np.zeros((1,), np.float32),
            config=config, length=10, cache_len=128, interpret=True,
            top_k=np.array([3], np.int32), top_p=np.array([0.7], np.float32),
        )
        np.testing.assert_array_equal(np.asarray(solo_plain), np.asarray(solo_filt))

    def test_filtered_logits_per_row_thresholds(self, rng):
        """_filtered_scaled_logits with per-row thresholds == stacking the
        static-scalar version row by row (sentinels = pass-through)."""
        x = self._rows(rng, n=4)
        ks = [1.0, 513.0, 40.0, 5.0]  # 513 = Vpad+1 sentinel (off)
        ps = [2.0, 0.5, 2.0, 0.9]  # 2.0 sentinel (off)
        ours = np.asarray(
            dk._filtered_scaled_logits(
                x, [jnp.float32(k) for k in ks], [jnp.float32(p) for p in ps]
            )
        )
        for i, (k, p) in enumerate(zip(ks, ps)):
            row = np.asarray(
                dk._filtered_scaled_logits(
                    x[i : i + 1],
                    k if k <= 512 else 0,
                    p if p < 1 else 0,
                )
            )
            np.testing.assert_array_equal(ours[i : i + 1], row, err_msg=f"row {i}")

    def test_engine_routes_filtered_requests_to_kernel(self, setup):
        """generate_ids no longer falls back to the XLA scan for top-k/top-p
        on the fused path: the engine pipeline receives the filter values."""
        from composer_tpu.train import generate as gen

        config, model, params = setup
        engine = gen.TransformerDecoder(model, params, dtype=jnp.float32)
        seen = []

        def fake_pipeline(packed, prompt, plens, seed, temps, topks,
                          topps, krows, vrows, cache_len, length, greedy,
                          use_k, use_p, ragged, start):
            seen.append((topks, topps, greedy, use_k, use_p))
            return jnp.zeros((prompt.shape[0], length), jnp.int32)

        engine._pipeline = fake_pipeline
        engine.generate(jnp.zeros((2, 4), jnp.int32), length=6,
                        temperature=0.8, top_k=12, top_p=0.95)
        assert len(seen) == 1
        topks, topps, greedy, use_k, use_p = seen[0]
        assert topks.tolist() == [12, 12]
        np.testing.assert_allclose(topps, 0.95)
        assert (greedy, use_k, use_p) == (False, True, True)


@pytest.mark.parametrize("use_relative", [False, True])
def test_batched_kernel_ragged_prompts_match_singles(use_relative):
    """A heterogeneous-prompt-length batch is bit-equal to per-row singles.

    Removes serving's equal-prompt-length coalescing restriction (VERDICT r2
    item 2): each row teacher-forces through its own prefix and its greedy
    generation must match an independent single-sequence kernel run on the
    untrimmed prompt."""
    from composer_tpu.ops.decode_kernel_batched import megakernel_generate_batched

    config, model, params = _setup(use_relative)
    packed = dk.pack_weights(params, config, dtype=jnp.float32)
    length = 10
    rng = np.random.default_rng(3)
    plens = np.array([4, 1, 7, 3], np.int32)
    prompts = rng.integers(0, 390, (4, int(plens.max()))).astype(np.int32)

    batched = megakernel_generate_batched(
        packed, prompts, 0, 0.0,
        config=config, length=length, cache_len=128, interpret=True,
        prompt_lengths=plens,
    )

    for row, plen in enumerate(plens):
        single = dk.megakernel_generate(
            packed, prompts[row, :plen], seed=0, temperature=0.0,
            config=config, length=length, cache_len=128, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(batched)[row], np.asarray(single), err_msg=f"row {row}"
        )


def test_batched_kernel_ragged_per_row_sampling_params():
    """Ragged prompts compose with per-row sampling params: greedy rows
    (temperature 0) inside the ragged batch still match their singles."""
    from composer_tpu.ops.decode_kernel_batched import megakernel_generate_batched

    config, model, params = _setup(True)
    packed = dk.pack_weights(params, config, dtype=jnp.float32)
    plens = np.array([5, 2], np.int32)
    prompts = np.array([[5, 100, 300, 17, 42], [9, 250, 0, 0, 0]], np.int32)
    temps = np.array([0.0, 0.0], np.float32)
    topks = np.array([0, 5], np.int32)

    batched = megakernel_generate_batched(
        packed, prompts, 0, temps,
        config=config, length=8, cache_len=128, interpret=True,
        top_k=topks, prompt_lengths=plens,
    )
    for row, plen in enumerate(plens):
        single = dk.megakernel_generate(
            packed, prompts[row, :plen], seed=0, temperature=0.0,
            config=config, length=8, cache_len=128, interpret=True,
            top_k=int(topks[row]),
        )
        np.testing.assert_array_equal(np.asarray(batched)[row], np.asarray(single))


def test_batched_kernel_ragged_validation():
    from composer_tpu.ops.decode_kernel_batched import megakernel_generate_batched

    config, model, params = _setup(False)
    packed = dk.pack_weights(params, config, dtype=jnp.float32)
    prompts = np.zeros((2, 4), np.int32)
    with pytest.raises(ValueError, match="prompt_lengths"):
        megakernel_generate_batched(
            packed, prompts, 0, 0.0, config=config, length=4, cache_len=128,
            interpret=True, prompt_lengths=np.array([4, 5], np.int32),
        )
    with pytest.raises(ValueError, match="prompt_lengths"):
        megakernel_generate_batched(
            packed, prompts, 0, 0.0, config=config, length=4, cache_len=128,
            interpret=True, prompt_lengths=np.array([4], np.int32),
        )
