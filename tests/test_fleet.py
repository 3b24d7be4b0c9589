"""Fleet serving: batched multi-session loop-closure detection."""
import numpy as np


def test_fleet_loop_closure_all_sessions():
    from rtabmap_tpu.parallel.fleet import demo_fleet

    best, best_p, state = demo_fleet(batch=8)
    assert (best == 3).all()          # every session re-localizes at place 3
    assert (best_p > 0.05).all()
    # posteriors are proper distributions
    post = np.asarray(state.posterior)
    assert post.shape[0] == 8


def test_fleet_sessions_independent():
    """A session's map must not leak into another's posterior."""
    import jax.numpy as jnp
    from rtabmap_tpu.bayes import filter as BF
    from rtabmap_tpu.parallel import fleet as FL

    rng = np.random.RandomState(2)
    vocab_cap, k = 1024, 64
    slab_np = np.where(rng.rand(vocab_cap, 256) > 0.5, 1, -1).astype(np.int8)
    slab = jnp.asarray(slab_np)
    wv = jnp.ones((vocab_cap,), bool)
    kernel = jnp.asarray(BF.DEFAULT_PREDICTION_LC)

    state = FL.init_fleet(2, 16, k, vocab_cap)
    # session 0 maps 4 places; session 1 maps 4 different places
    words = rng.randint(0, vocab_cap, (8, k)).astype(np.int32)
    plan = [(0, 0), (0, 1), (0, 2), (0, 3), (1, 4), (1, 5), (1, 6), (1, 7)]
    for slot, (sess, wi) in enumerate(plan):
        desc = jnp.asarray(slab_np[words[wi]])[None]
        wid, _, _, _ = FL.fleet_tick(
            FL.FleetState(*[x[sess:sess+1] for x in state]), desc,
            jnp.ones((1, k), bool), slab, wv, kernel, jnp.float32(0.9),
            vocab_cap)
        state = FL.fleet_insert(state, jnp.asarray([sess], jnp.int32),
                                jnp.asarray([slot % 4], jnp.int32), wid)
    # query place A against BOTH sessions, twice (the Bayes recursion
    # needs temporal consistency to concentrate — reference LoopRatio)
    desc = jnp.asarray(np.stack([slab_np[words[0]], slab_np[words[0]]]))
    for _ in range(2):
        _, post, best, best_p = FL.fleet_tick(
            state, desc, jnp.ones((2, k), bool), slab, wv, kernel,
            jnp.float32(0.9), vocab_cap)
        state = state._replace(posterior=post)
    # session 0 recognizes node 0 strongly; session 1 must not
    assert int(best[0]) == 0
    p = np.asarray(post)
    assert p[0, 0] > 2.0 * p[1, int(best[1])]


def test_fleet_demo_cli():
    from rtabmap_tpu.tools.cli import tool_fleet_demo

    assert tool_fleet_demo(["4"])
