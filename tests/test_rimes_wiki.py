"""RIMES dataset variant + wiki_text sampler (reference
utils/parseRIMESlines.py, datasets/author_rimeslines_dataset.py,
wiki_text.py)."""

import numpy as np

from affganwriting_tpu.data.parse_rimes import RimesLinesIndex, parse_rimes_xml
from affganwriting_tpu.data.wiki_text import WikiText, word_process

_RIMES_XML = """<?xml version="1.0" encoding="UTF-8"?>
<IcdarData>
  <SinglePage FileName="images/page-001.png">
    <Paragraph>
      <Line Value="Bonjour le monde" Top="100" Bottom="160" Left="50" Right="600"/>
      <Line Value="deuxi&#232;me ligne" Top="200" Bottom="230" Left="60" Right="580"/>
    </Paragraph>
  </SinglePage>
  <SinglePage FileName="images/page-002.png">
    <Paragraph>
      <Line Value="autre page" Top="90" Bottom="150" Left="40" Right="500"/>
    </Paragraph>
  </SinglePage>
</IcdarData>
"""


def test_parse_rimes_xml(tmp_path):
    p = tmp_path / "lines_training_2011.xml"
    p.write_text(_RIMES_XML)
    pages = parse_rimes_xml(str(p))
    assert set(pages) == {"page-001.png", "page-002.png"}
    recs = pages["page-001.png"]
    assert len(recs) == 2
    assert recs[0].text == "Bonjour le monde"
    assert recs[1].text == "deuxième ligne"
    # mean-height normalization: heights 61 and 31 -> meanH 46; line 2 is
    # centered out to 46, both get +-11.5 horizontal margin
    mean_h = (61 + 31) / 2
    y0, y1, x0, x1 = recs[1].bounds
    assert (y1 - y0) in (int(mean_h), int(mean_h) + 1)
    assert x0 == round(60 - mean_h / 4)
    # line taller than mean keeps its vertical bounds
    assert recs[0].bounds[0] == 100 and recs[0].bounds[1] == 161


def test_rimes_index_author_surface(tmp_path):
    (tmp_path / "lines_training_2011.xml").write_text(_RIMES_XML)
    idx = RimesLinesIndex(str(tmp_path), split="train")
    assert idx.authors == ["page-001.png", "page-002.png"]
    assert len(idx) == 3


def test_rimes_plugs_into_author_line_dataset(tmp_path):
    from affganwriting_tpu.data.lines import LineCharset
    from affganwriting_tpu.data.parse_iam import AuthorLineDataset

    (tmp_path / "lines_training_2011.xml").write_text(_RIMES_XML)
    idx = RimesLinesIndex(str(tmp_path), split="train")
    import os

    import affganwriting_tpu.data as data_pkg

    cs = LineCharset(os.path.join(
        os.path.dirname(data_pkg.__file__), "assets", "line",
        "RIMES_characterset_lines.json"))
    ds = AuthorLineDataset(idx, str(tmp_path), cs, a_batch_size=2,
                           img_height=64, label_len=48)
    batch = next(ds.batches(batch_authors=1, epoch=0))
    assert batch["image"].shape[0] == 2
    assert (batch["label_lengths"] > 0).all()


def test_word_process_accents_and_charset():
    assert word_process("déjà-vu") == "deja-vu"
    assert word_process("naïve|pipe") == "naivepipe"
    assert word_process("éè") == "ee"


def test_wiki_text_snippets():
    arts = ["First article words here\n\nmore words follow now\n"
            "References\nsome ref",
            "Second article with different content entirely"]
    w = WikiText(articles=iter(arts * 10), snippet_chars=20)
    s1 = w[0]
    assert len(s1) >= 20 or s1   # pops words until passing the target
    assert "References" not in s1
    # successive snippets drain successive words deterministically
    s2 = w[1]
    assert s1.split(" ")[0] == "First"
    assert s1 != s2


def test_wiki_text_file_fallback():
    w = WikiText()   # lotr.txt fallback shipped in-repo
    s = w[0]
    assert isinstance(s, str) and len(s) > 10
    assert all(c in set(
        " !\"#&'()*+,-./0123456789:;?"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz")
        for c in s)
