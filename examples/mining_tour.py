"""Classical data-mining tour: the textbook algorithms the course title
promises, run end-to-end against one catalog — each one a registered,
oracle-verified query, composed here the way an analyst would actually
walk a dataset.

    python examples/mining_tour.py [sf_dir]

stop 1  market-basket association rules + Apriori triple itemsets
        (support / confidence / lift, downward-closure pruning)
stop 2  grid-density clustering + distance-based outliers over the
        embedding space (CLIQUE/DENCLUE grid, Knorr-Ng DB(ε,k))
stop 3  item-item collaborative filtering (the neighborhood recommender)
stop 4  RFM customer segmentation + funnel conversion
stop 5  time-series diagnostics: ACF/Ljung-Box, STL seasonal indices,
        SAX motifs, Theil-Sen robust trend
stop 6  supervised structure: MDLP entropy split, CART variance split,
        naive-Bayes confusion audit, BH-controlled experiment readout
stop 7  one-line run report

Every stop is lazy DataFrame plans from the registry; the only
driver-side data are the small result frames printed per stop.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from advanced_data_mining_and_big_data_analysis_spark import get_spark
from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries

STOPS = [
    ("association rules", "a0093_association_rules", 5),
    ("Apriori triples", "a0053_apriori_triples", 5),
    ("grid-density clusters", "a0100_grid_density_clusters", 6),
    ("density-level hierarchy (HDBSCAN profile)", "a0002_density_level_hierarchy", 4),
    ("Lloyd k-means", "a0070_kmeans_lloyd", 8),
    ("distance outliers", "a0062_distance_outliers", 5),
    ("item-item CF", "a0054_itemitem_cf", 5),
    ("RFM segments", "a0057_rfm_segments", 5),
    ("funnel conversion", "a0102_funnel_conversion", 4),
    ("ACF + Ljung-Box", "a0050_acf_ljung_box", 5),
    ("STL decomposition", "a0097_stl_decompose", 10),
    ("SAX motifs", "a0104_sax_motifs", 5),
    ("Theil-Sen trend", "a0055_theil_sen", 1),
    ("MDLP split", "a0056_mdlp_split", 3),
    ("CART split", "a0058_cart_split", 3),
    ("naive-Bayes confusion", "a0063_naive_bayes_langid", 8),
    ("BH-FDR readout", "a0059_bh_fdr", 5),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("mining-tour")
    qs = all_queries()
    t0 = time.time()
    for label, name, show in STOPS:
        t = time.time()
        df = qs[name].fn(spark, sf_dir)
        rows = df.limit(show).collect()
        print(f"\n== {label} ({name}, {time.time() - t:.2f}s)")
        for r in rows:
            print("  ", dict(r.asDict()))
    print(
        f"\ntour complete: {len(STOPS)} algorithms, {time.time() - t0:.1f}s total at {sf_dir}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
