"""IP address / prefix functions (IpPrefixFunctions.java parity).

Reference surface: presto-main/.../operator/scalar/IpPrefixFunctions.java
(@ScalarFunction ip_prefix:50,70, ip_subnet_min:79, ip_subnet_max:87,
ip_subnet_range:113, is_subnet_of:124,133) over the IPADDRESS/IPPREFIX
types (type/IpAddressOperators.java, IpPrefixOperators.java).

Spark mapping: addresses and prefixes travel as canonical strings
(``1.2.3.4``, ``2001:db8::/32``); the arithmetic runs in Arrow-vectorized
pandas UDFs over the stdlib ``ipaddress`` module, so both IPv4 and IPv6
work and nothing is per-row Python. Batch columns in, batch columns out —
safe in any projection at scale.
"""

from __future__ import annotations

import ipaddress

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _net(prefix: str) -> ipaddress._BaseNetwork:
    # strict=False masks host bits to zero, matching the reference's
    # IPPREFIX cast (IpPrefixOperators.castFromVarcharToIpPrefix): in
    # Presto, ip_subnet_min('1.2.3.4/24') is valid input and means
    # 1.2.3.0/24; strict=True would raise inside the Spark task.
    return ipaddress.ip_network(prefix, strict=False)


@F.pandas_udf(T.StringType())
def _ip_prefix(addr: pd.Series, subnet: pd.Series) -> pd.Series:
    def one(a, n):
        if a is None or n is None:
            return None
        iface = ipaddress.ip_interface(f"{a}/{int(n)}")
        return str(iface.network)

    return pd.Series([one(a, n) for a, n in zip(addr, subnet)], dtype=object)


@F.pandas_udf(T.StringType())
def _ip_subnet_min(prefix: pd.Series) -> pd.Series:
    return prefix.map(lambda p: str(_net(p).network_address) if p is not None else None)


@F.pandas_udf(T.StringType())
def _ip_subnet_max(prefix: pd.Series) -> pd.Series:
    return prefix.map(lambda p: str(_net(p).broadcast_address) if p is not None else None)


@F.pandas_udf(T.ArrayType(T.StringType()))
def _ip_subnet_range(prefix: pd.Series) -> pd.Series:
    def one(p):
        if p is None:
            return None
        net = _net(p)
        return [str(net.network_address), str(net.broadcast_address)]

    return prefix.map(one)


@F.pandas_udf(T.BooleanType())
def _is_subnet_of(prefix: pd.Series, other: pd.Series) -> pd.Series:
    def one(p, o):
        if p is None or o is None:
            return None
        net = _net(p)
        if "/" in o:
            # prefix ⊇ prefix (IpPrefixFunctions.java:133 overload);
            # strict=False canonicalizes host bits like the IPPREFIX cast
            return ipaddress.ip_network(o, strict=False).subnet_of(net)
        return ipaddress.ip_address(o) in net

    return pd.Series([one(p, o) for p, o in zip(prefix, other)], dtype=object)


def register_ip_functions(spark: SparkSession) -> None:
    spark.udf.register("ip_prefix", _ip_prefix)
    spark.udf.register("ip_subnet_min", _ip_subnet_min)
    spark.udf.register("ip_subnet_max", _ip_subnet_max)
    spark.udf.register("ip_subnet_range", _ip_subnet_range)
    spark.udf.register("is_subnet_of", _is_subnet_of)
