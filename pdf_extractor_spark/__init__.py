"""spark-transcript-extractor: PySpark-native main-content extraction engine.

See SURVEY.md for the structural map to the reference
(pmwangi5/pdf-extractor) and README.md for the architecture overview.
"""

__version__ = "0.1.0"
