"""RBF-kernel approximation via Random Fourier Features (closes the
SURVEY §7 M4 gap: the reference's ``svm.SVC()`` is an RBF-kernel SVM
[modeling/modeling.ipynb:450], MLlib's LinearSVC is linear).

Rahimi & Recht, "Random Features for Large-Scale Kernel Machines"
(NeurIPS 2007): for the RBF kernel k(x,y) = exp(-gamma*||x-y||^2),
z(x) = sqrt(2/D) * cos(W x + b) with W ~ N(0, 2*gamma) and
b ~ U[0, 2*pi] satisfies E[z(x)^T z(y)] = k(x,y) — so a LINEAR model on
z(x) approximates the kernel machine, and the kernel trick's O(n^2)
Gram matrix never materializes. That is exactly the 100 TB posture: the
lift is one Arrow-batched matrix multiply per partition (map-only, no
shuffle), and training stays in MLlib's distributed LinearSVC.
"""

from __future__ import annotations

import numpy as np
from pyspark.ml.classification import LinearSVC
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def rff_transform(
    df: DataFrame,
    input_col: str = "features",
    output_col: str = "rff_features",
    n_components: int = 128,
    gamma: float = 1.0,
    seed: int = 42,
    input_dim: int | None = None,
) -> DataFrame:
    """Append the RFF lift of a vector column. Deterministic given
    ``seed`` (the W/b draw happens once on the driver and broadcasts
    inside the Arrow-serialized closure). ``input_dim`` is read from the
    first row if not given — pass it when the frame is expensive to
    touch."""
    if input_dim is None:
        input_dim = len(df.select(vector_to_array(input_col)).first()[0])
    rng = np.random.default_rng(seed)
    w = rng.normal(0.0, np.sqrt(2.0 * gamma), size=(input_dim, n_components))
    b = rng.uniform(0.0, 2.0 * np.pi, size=n_components)
    scale = np.sqrt(2.0 / n_components)

    @pandas_udf("array<double>")
    def _lift(arrs):
        import numpy as _np
        import pandas as _pd

        x = _np.stack(arrs.to_numpy())
        z = scale * _np.cos(x @ w + b)
        return _pd.Series(list(z))

    return df.withColumn(
        output_col, array_to_vector(_lift(vector_to_array(F.col(input_col))))
    )


def fit_rbf_svc(
    train: DataFrame,
    features_col: str = "features",
    label_col: str = "label",
    n_components: int = 128,
    gamma: float = 1.0,
    seed: int = 42,
):
    """Fit LinearSVC on the RFF lift. Returns (model, transform) where
    ``transform(df)`` applies the SAME frozen (W, b) draw and the model —
    apply it to held-out data before ``model.transform``."""
    dim = len(train.select(vector_to_array(features_col)).first()[0])

    def lift(df: DataFrame) -> DataFrame:
        return rff_transform(
            df,
            input_col=features_col,
            n_components=n_components,
            gamma=gamma,
            seed=seed,
            input_dim=dim,
        )

    svc = LinearSVC(featuresCol="rff_features", labelCol=label_col)
    model = svc.fit(lift(train))

    def transform(df: DataFrame) -> DataFrame:
        return model.transform(lift(df))

    return model, transform
