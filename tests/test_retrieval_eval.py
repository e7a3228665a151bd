"""Device-vs-host parity of the retrieval ranking paths (VERDICT r2 #7).

The on-device rank program (`eval/retrieval.py:device_ranks`) must produce
EXACTLY the host numpy argsort ranks; `itm_eval(ranks=...)` must equal the
score-matrix path.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.fast

from lpi_tpu.eval.retrieval import (
    _ranks_i2t,
    _ranks_t2i,
    device_ranks,
    itm_eval,
)


def _synthetic(rng, n_img=40, texts_per_img=(1, 5)):
    img2txt = {}
    txt2img = {}
    t = 0
    for i in range(n_img):
        k = rng.randint(*texts_per_img) if texts_per_img[0] != texts_per_img[1] \
            else texts_per_img[0]
        img2txt[i] = list(range(t, t + k))
        for j in range(t, t + k):
            txt2img[j] = i
        t += k
    n_txt = t
    d = 16
    img = rng.randn(n_img, d).astype(np.float32)
    txt = rng.randn(n_txt, d).astype(np.float32)
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    return img, txt, img2txt, txt2img


class TestDeviceRanks:
    @pytest.mark.parametrize("texts_per_img", [(5, 5), (1, 6)])
    def test_equals_host_argsort(self, rng, texts_per_img):
        img, txt, img2txt, txt2img = _synthetic(rng, 40, texts_per_img)
        scores = img @ txt.T
        host_i2t = _ranks_i2t(scores, img2txt)
        host_t2i = _ranks_t2i(scores.T, txt2img)
        dev_i2t, dev_t2i = device_ranks(img, txt, txt2img, img2txt)
        np.testing.assert_array_equal(dev_i2t, host_i2t.astype(np.int64))
        np.testing.assert_array_equal(dev_t2i, host_t2i.astype(np.int64))

    def test_itm_eval_same_via_ranks(self, rng):
        img, txt, img2txt, txt2img = _synthetic(rng, 30, (2, 4))
        n_img, n_txt = img.shape[0], txt.shape[0]
        img_cat = rng.randint(0, 3, n_img)
        txt_cat = np.asarray([img_cat[txt2img[t]] for t in range(n_txt)])
        scores = img @ txt.T
        via_scores = itm_eval(scores, scores.T, txt2img, img2txt,
                              img_cat, txt_cat, 3)
        ranks = device_ranks(img, txt, txt2img, img2txt)
        via_ranks = itm_eval(None, None, txt2img, img2txt,
                             img_cat, txt_cat, 3, ranks=ranks)
        assert via_scores["summary"] == via_ranks["summary"]
        assert via_scores["i2t"] == via_ranks["i2t"]
        assert via_scores["t2i"] == via_ranks["t2i"]
