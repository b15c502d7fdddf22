"""End-to-end gradient-based cost tuning (app/tune.py): the task loss must
decrease under optimization through the differentiable solve."""

from quadrotorilqr_tpu.app.tune import tune


def test_tuning_reduces_task_loss():
    history, q_diag = tune(steps=8, batch=4, verbose=False)
    assert history[-1] < history[0], (history[0], history[-1])
    assert (q_diag > 0).all()
