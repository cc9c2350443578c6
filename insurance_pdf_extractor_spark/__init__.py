"""PySpark-native insurance-document extraction engine.

From-scratch re-expression of fran-abellan88/insurance-pdf-extractor's
extraction + analytics capabilities as a Spark DataFrame pipeline over
interleaved text+media document tables. See SURVEY.md for the full
blueprint and citations.
"""

__version__ = "0.1.0"
