"""Pure-Python reference semantics (no Spark imports here).

Everything in this subpackage operates on UTF-8 *bytes* so that span offsets
are byte offsets, exactly like Go string indexing in the reference
(ThirdAILabs/ner-backend). These functions are the single source of truth:
the Spark pandas-UDF kernels call them batch-wise, and the pytest oracle
calls them row-wise, so correctness of the distributed pipeline reduces to
correctness of this module (proven by the ported golden tests).
"""
