"""IP prefix functions (IpPrefixFunctions.java parity, incl. IPv6)."""

from __future__ import annotations

from sensql_presto_spark.functions.ip import register_ip_functions


def test_ipv6_prefix_and_range(spark):
    register_ip_functions(spark)
    row = spark.sql(
        """
        SELECT ip_prefix('2001:db8:85a3::8a2e:370:7334', 48) AS pfx,
               ip_subnet_min(ip_prefix('2001:db8:85a3::8a2e:370:7334', 48)) AS lo,
               is_subnet_of('2001:db8::/32', '2001:db8:85a3::1') AS within,
               is_subnet_of('2001:db8::/32', '2001:db9::1') AS outside
        """
    ).collect()[0]
    assert row.pfx == "2001:db8:85a3::/48"
    assert row.lo == "2001:db8:85a3::"
    assert row.within is True and row.outside is False


def test_ipv4_masks_host_bits(spark):
    register_ip_functions(spark)
    row = spark.sql(
        "SELECT ip_prefix('192.168.255.255', 9) AS p, "
        "ip_subnet_max('10.1.2.0/24') AS hi"
    ).collect()[0]
    assert row.p == "192.128.0.0/9"
    assert row.hi == "10.1.2.255"
