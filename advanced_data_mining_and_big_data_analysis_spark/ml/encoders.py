"""Feature-encoding pipeline builders (SURVEY §2.9).

Reproduces the reference's ColumnTransformer routing (kaggle.py:784-790):
object columns → OneHotEncoder, numeric columns → MinMaxScaler, assembled
into a single vector. StringIndexer uses alphabetAsc ordering for sklearn
LabelEncoder parity (lexicographic codes, kaggle.py:372-395).
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.feature import MinMaxScaler, OneHotEncoder, StringIndexer, VectorAssembler


def build_feature_pipeline(
    cat_cols: list[str],
    num_cols: list[str],
    output_col: str = "features",
    one_hot: bool = True,
    scale: bool = True,
) -> Pipeline:
    """StringIndexer(alphabetAsc) → OneHotEncoder(keep-all) → assemble →
    MinMaxScaler. Matches sklearn defaults the reference relies on:
    lexicographic label codes, dense one-hot (dropLast=False ~
    sparse=False), handle_unknown='ignore' ~ handleInvalid='keep'."""
    stages = []
    vec_inputs: list[str] = []
    # intermediate names carry the output_col so two pipelines over the
    # same categorical columns can stack on one DataFrame
    if cat_cols:
        idx_cols = [f"{c}_{output_col}_idx" for c in cat_cols]
        stages.append(
            StringIndexer(
                inputCols=cat_cols,
                outputCols=idx_cols,
                stringOrderType="alphabetAsc",
                handleInvalid="keep",
            )
        )
        if one_hot:
            oh_cols = [f"{c}_{output_col}_oh" for c in cat_cols]
            stages.append(OneHotEncoder(inputCols=idx_cols, outputCols=oh_cols, dropLast=False))
            vec_inputs.extend(oh_cols)
        else:
            vec_inputs.extend(idx_cols)
    vec_inputs.extend(num_cols)
    raw_col = f"_{output_col}_raw" if scale else output_col
    stages.append(VectorAssembler(inputCols=vec_inputs, outputCol=raw_col, handleInvalid="keep"))
    if scale:
        stages.append(MinMaxScaler(inputCol=raw_col, outputCol=output_col))
    return Pipeline(stages=stages)
