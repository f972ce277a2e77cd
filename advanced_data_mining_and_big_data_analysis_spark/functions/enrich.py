"""Enrichment operators from the reference's E1 ingest pipeline (SURVEY §3).

- GDP join (kaggle.py:195-202): the reference does a per-row pandas
  ``apply`` looking up ``gdp_df.loc[year, 'GDP_' + country]`` — an O(n)
  Python nested loop. Here: unpivot the wide GDP table once (stack), then
  ONE broadcast hash join, then log1p. At 100 TB the fact side never
  shuffles — the 5-row dim travels to the executors.
- Pseudo-label union (kaggle.py:409-416): label the test frame from a
  predictions table (row_id equi-join) and append to train (unionByName).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gdp_wide_to_long(gdp_wide: DataFrame, countries: list[str]) -> DataFrame:
    """(year, GDP_Finland, GDP_Norway, ...) → (year, country, gdp)."""
    n = len(countries)
    pairs = ", ".join(f"'{c}', GDP_{c}" for c in countries)
    return gdp_wide.selectExpr("year", f"stack({n}, {pairs}) AS (country, gdp)")


def join_gdp(
    facts: DataFrame,
    gdp_wide: DataFrame,
    countries: list[str],
    date_col: str = "date",
    log_transform: bool = True,
) -> DataFrame:
    """Broadcast-join per-(year, country) GDP onto a fact table; optional
    log1p conditioning as the reference applies (kaggle.py:202)."""
    gdp_long = gdp_wide_to_long(gdp_wide, countries)
    out = facts.withColumn("_yr", F.year(F.col(date_col))).join(
        F.broadcast(gdp_long),
        (F.col("_yr") == gdp_long.year) & (facts.country == gdp_long.country),
        "left",
    ).drop("_yr", "year", gdp_long.country)
    if log_transform:
        out = out.withColumn("gdp", F.log1p(F.col("gdp")))
    return out


def add_pseudo_labels(
    train: DataFrame,
    test: DataFrame,
    pseudo: DataFrame,
    id_col: str = "row_id",
    label_col: str = "num_sold",
) -> DataFrame:
    """Union train with test rows labeled by a predictions table
    (kaggle.py:409-416). Test rows without a pseudo label are dropped —
    an unlabeled training row is useless."""
    labeled_test = (
        test.join(pseudo.select(id_col, F.col(label_col).alias("_pl")), id_col, "inner")
        .withColumn(label_col, F.col("_pl").cast("float"))
        .drop("_pl")
    )
    return train.unionByName(labeled_test.select(*train.columns))


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "row_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): each row draws u in (0,1) from a hash of its id and
    ranks by ln(u)/w — the k largest keys are a correct weight-
    proportional sample. One TakeOrdered pass, no per-group state, and
    the hash-derived u makes the sample reproducible across engines,
    epochs, and cluster sizes (the same property q93's mixture sampler
    uses). The log form avoids u**(1/w) underflow for large weights.

    A-ES requires strictly positive weights: w=0 makes ln(u)/w -inf/NaN
    and w<0 flips the key positive (such rows would always win). Rows
    with non-positive or null weight carry zero probability mass, so
    they are filtered out before keying rather than silently ranked.

    Adds ``_skey`` (the ranking key) to the output for auditability.
    """
    df = df.filter(F.col(weight_col) > 0)
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10).cast("double")
        + 0.5
    ) / 16777216.0  # strictly interior (0,1): u=0 would make ln() -inf,
    # u=1 would make the key 0 = the global max, letting a 1-in-16M hash
    # collision win the sample regardless of weight
    key = F.log(u) / F.col(weight_col)
    return (
        df.withColumn("_skey", key)
        .orderBy(F.col("_skey").desc(), F.col(id_col))
        .limit(k)
    )
