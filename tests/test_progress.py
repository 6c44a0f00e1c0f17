"""ProgressLine: the per-iteration progress display (reference parity:
ignite ProgressBar, `ddpm/trainer.py:410`) — tty gating, rate limiting,
no device access by construction (it only ever receives host scalars)."""

import io

from ccdm_tpu.utils.progress import ProgressLine


class TtyStringIO(io.StringIO):
    def isatty(self):
        return True


def test_disabled_on_non_tty():
    stream = io.StringIO()
    p = ProgressLine(enable=True, stream=stream)
    assert not p.enabled
    p.update(epoch=0, step=1, steps_per_epoch=10, items_done=4)
    p.close()
    assert stream.getvalue() == ""


def test_disabled_by_flag_even_on_tty():
    stream = TtyStringIO()
    p = ProgressLine(enable=False, stream=stream)
    p.update(epoch=0, step=1, steps_per_epoch=10, items_done=4)
    p.close()
    assert stream.getvalue() == ""


def test_draws_and_closes_on_tty():
    stream = TtyStringIO()
    p = ProgressLine(enable=True, min_interval_s=0.0, stream=stream)
    p.update(epoch=2, step=13, steps_per_epoch=20, items_done=52, loss=0.125)
    out = stream.getvalue()
    assert out.startswith("\r")
    assert "epoch 2" in out and "13/20" in out and "loss=0.125" in out
    p.close()
    assert stream.getvalue().endswith("\n")
    p.close()  # idempotent
    assert stream.getvalue().count("\n") == 1


def test_rate_limit_suppresses_redraws():
    stream = TtyStringIO()
    p = ProgressLine(enable=True, min_interval_s=3600.0, stream=stream)
    p.update(epoch=0, step=1, steps_per_epoch=10, items_done=4, force=True)
    first = stream.getvalue()
    for i in range(2, 9):
        p.update(epoch=0, step=i, steps_per_epoch=10, items_done=4 * i)
    assert stream.getvalue() == first  # all rate-limited away


def test_epoch_boundary_shows_full_bar():
    stream = TtyStringIO()
    p = ProgressLine(enable=True, min_interval_s=0.0, stream=stream)
    # step 20 of a 20-step epoch renders 20/20, not 0/20
    p.update(epoch=0, step=20, steps_per_epoch=20, items_done=80)
    assert "20/20" in stream.getvalue()


def test_missing_loss_renders_placeholder():
    stream = TtyStringIO()
    p = ProgressLine(enable=True, min_interval_s=0.0, stream=stream)
    p.update(epoch=0, step=1, steps_per_epoch=10, items_done=4, loss=None)
    assert "loss=--" in stream.getvalue()
