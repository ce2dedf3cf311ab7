import jax.numpy as jnp
import numpy as np

from affganwriting_tpu.data.lines import LineCharset
from affganwriting_tpu.train.swa import ema_update, swa_init, swa_update


def test_swa_running_average():
    p0 = {"w": jnp.asarray([0.0, 0.0])}
    s = swa_init(p0)
    s = swa_update(s, {"w": jnp.asarray([2.0, 4.0])})
    s = swa_update(s, {"w": jnp.asarray([4.0, 8.0])})
    # avg of [0,0] start replaced: first update avg=(0*0+2)/1=2 ...
    np.testing.assert_allclose(np.asarray(s["avg"]["w"]), [3.0, 6.0])
    assert int(s["count"]) == 2


def test_ema():
    e = {"w": jnp.asarray(1.0)}
    e = ema_update(e, {"w": jnp.asarray(0.0)}, decay=0.9)
    np.testing.assert_allclose(float(e["w"]), 0.9)


def test_rimes_charset_loads():
    import os

    import affganwriting_tpu.data as data_pkg

    cs = LineCharset(os.path.join(
        os.path.dirname(data_pkg.__file__), "assets", "line",
        "RIMES_characterset_lines.json"))
    assert cs.n_class > 10
    some = list(cs.char_to_idx)[0]
    assert cs.decode(cs.encode(some)) == some
