"""CTC prefix scorer parity vs the reference CTCPrefixScoreTH: candidate
scores, selected survivor states, and streaming extend across blocks."""

import numpy as np
import pytest

import jax.numpy as jnp

from speechcatcher_tpu.decode.ctc_prefix import (
    LOGZERO,
    ctc_advance_state,
    ctc_extend,
    ctc_score_candidates,
    init_ctc_state,
)

torch = pytest.importorskip("torch")
# Parity tests need the reference implementation (mounted read-only
# at /root/reference in the dev environment; absent in CI).
pytest.importorskip("speechcatcher")

V = 12       # vocab
BEAM = 3
K = 5        # pre-beam candidates
BLANK = 0
EOS = V - 1
TCAP = 64


def _rand_logp(rng, t):
    x = rng.randn(1, t, V).astype(np.float32)
    x = torch.log_softmax(torch.from_numpy(x), dim=-1)
    return x.numpy()


def _make_reference(logp):
    from speechcatcher.beam_search.ctc_prefix_score_full import CTCPrefixScoreTH

    x = torch.from_numpy(logp.copy())
    xlens = torch.tensor([logp.shape[1]])
    return CTCPrefixScoreTH(x, xlens, BLANK, EOS)


def _ref_score(ref, yseqs, merged_state, cand):
    y = [torch.from_numpy(np.asarray(s, dtype=np.int64)) for s in yseqs]
    ids = torch.from_numpy(cand.astype(np.int64))
    scores, new_state = ref(y, merged_state, scoring_ids=ids)
    return scores.numpy(), new_state


def _merge_ref_states(selected):
    """Batch per-hyp 4-tuple states like the reference scorer wrapper
    (scorers.py:188-211)."""
    if selected[0] is None:
        return None
    r = torch.stack([s[0] for s in selected], dim=2)
    s = torch.stack([s[1] for s in selected])
    return (r, s, selected[0][2], selected[0][3])


def test_scores_and_states_match_reference_over_steps():
    rng = np.random.RandomState(0)
    t1 = 20
    logp = _rand_logp(rng, t1)

    ref = _make_reference(logp)

    state = init_ctc_state(1, BEAM, TCAP, V)
    state = ctc_extend(state, jnp.asarray(logp), jnp.array([True]))

    sos = EOS
    yseqs = [[sos]] * BEAM
    ref_sel = [None] * BEAM
    merged = None

    for step in range(5):
        olen = len(yseqs[0]) - 1
        # unique candidate ids per hyp (like decoder pre-beam top-K)
        cand = np.stack(
            [rng.choice(np.arange(V), size=K, replace=False) for _ in range(BEAM)]
        ).astype(np.int64)

        ref_scores, ref_state = _ref_score(ref, yseqs, merged, cand)

        last_ids = np.array([[y[-1] for y in yseqs]], dtype=np.int32)
        our_scores, our_psi = ctc_score_candidates(
            state,
            jnp.asarray(last_ids),
            jnp.array([olen], jnp.int32),
            jnp.asarray(cand[None].astype(np.int32)),
            blank=BLANK,
            eos=EOS,
        )
        ours = np.asarray(our_scores)[0]
        mask = ref_scores > LOGZERO / 2  # compare only scored entries
        np.testing.assert_allclose(
            ours[mask], ref_scores[mask], rtol=1e-4, atol=1e-4,
            err_msg=f"step {step}",
        )
        # Non-candidates must be ~logzero - s in both.
        np.testing.assert_allclose(
            ours[~mask], ref_scores[~mask], rtol=1e-3, atol=1.0,
            err_msg=f"step {step} (non-candidates)",
        )

        # Choose survivors: random source hyp + random candidate token.
        src = rng.randint(0, BEAM, size=BEAM)
        chosen = np.array(
            [cand[s][rng.randint(0, K)] for s in src], dtype=np.int32
        )

        # Reference path: select_state per survivor, then merge.
        from speechcatcher.beam_search.scorers import CTCPrefixScorer

        sel = []
        for b in range(BEAM):
            r, log_psi, f_min, f_max, idmap = ref_state
            i, tok = int(src[b]), int(chosen[b])
            s_sel = log_psi[i, tok].expand(log_psi.size(1))
            pos = idmap[i, tok]
            r_sel = r[:, :, i, pos if pos >= 0 else 0]
            sel.append((r_sel, s_sel, f_min, f_max))
        merged = _merge_ref_states(sel)

        state = ctc_advance_state(
            state,
            our_psi,
            jnp.asarray(src[None].astype(np.int32)),
            jnp.asarray(chosen[None]),
            jnp.asarray(cand[None].astype(np.int32)),
            jnp.asarray(last_ids),
            jnp.array([olen], jnp.int32),
        )

        # Compare survivor forward variables r (ours: (S, B, 2, T)).
        ref_r = merged[0].numpy()  # (T, 2, BEAM)
        our_r = np.asarray(state.r)[0, :, :, :t1]  # (BEAM, 2, T)
        np.testing.assert_allclose(
            our_r.transpose(2, 1, 0), ref_r, rtol=1e-4, atol=1e-3,
            err_msg=f"step {step} (r)",
        )
        ref_s = merged[1].numpy()[:, 0]
        np.testing.assert_allclose(
            np.asarray(state.s)[0], ref_s, rtol=1e-4, atol=1e-4,
            err_msg=f"step {step} (s)",
        )

        yseqs = [yseqs[s] + [int(c)] for s, c in zip(src, chosen)]


def test_streaming_extend_matches_fresh():
    """Extending frames block-by-block must equal initializing from scratch
    (for the initial all-blank state)."""
    rng = np.random.RandomState(1)
    l1, l2 = 12, 9
    logp1 = _rand_logp(rng, l1)
    logp2 = _rand_logp(rng, l2)
    full = np.concatenate([logp1, logp2], axis=1)

    st_inc = init_ctc_state(1, BEAM, TCAP, V)
    st_inc = ctc_extend(st_inc, jnp.asarray(logp1), jnp.array([True]))
    st_inc = ctc_extend(st_inc, jnp.asarray(logp2), jnp.array([True]))

    st_once = init_ctc_state(1, BEAM, TCAP, V)
    st_once = ctc_extend(st_once, jnp.asarray(full), jnp.array([True]))

    np.testing.assert_allclose(
        np.asarray(st_inc.logp)[:, :, : l1 + l2],
        np.asarray(st_once.logp)[:, :, : l1 + l2],
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(st_inc.r)[:, :, :, : l1 + l2],
        np.asarray(st_once.r)[:, :, :, : l1 + l2],
        rtol=1e-5, atol=1e-5,
    )
    assert int(st_inc.enc_len[0]) == l1 + l2
