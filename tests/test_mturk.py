import csv

from affganwriting_tpu.eval.mturk import parse_choices, preference_stats


def test_preference_stats(tmp_path):
    p = tmp_path / "study.csv"
    with open(p, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["worker", "item", "choice"])
        w.writeheader()
        for i in range(30):
            w.writerow({"worker": f"w{i % 5}", "item": f"it{i % 3}",
                        "choice": "generated" if i % 3 else "real"})
    rows = parse_choices(str(p))
    stats = preference_stats(rows)
    assert stats["n"] == 30
    assert abs(stats["rate"] - 20 / 30) < 1e-9
    lo, hi = stats["ci95"]
    assert lo <= stats["rate"] <= hi
    assert set(stats["per_item"]) == {"it0", "it1", "it2"}
