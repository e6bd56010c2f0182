"""Access control: GRANT/REVOKE privileges, roles, SET ROLE, SHOW GRANTS.

Parity target (SURVEY §3.4 tail): the reference's access-control statement
surface — grammar ``SqlBase.g4:97-117`` (grant/revoke/createRole/dropRole/
grantRoles/revokeRoles/setRole/showGrants/showRoles productions), executed
through ``presto-main/.../security/AccessControlManager.java`` and modeled
on the file/connector-based ``ConnectorAccessControl`` implementations
(table-level privileges, roles with transitive membership, the implicit
PUBLIC role, WITH GRANT OPTION regrants, and an admin set that bypasses
checks — ``AccessControlManager.checkCanSelectFromColumns`` path).

Scope choices, mirroring the reference's pragmatics:

- TABLE-level privileges (SELECT/INSERT/DELETE/UPDATE, ALL expands) — the
  FileBasedAccessControl granularity; column-level masks are out of scope.
- The store is engine-process state shared by every statement session the
  host wires it into (the HTTP server shares one store across its
  per-client sessions, so an admin GRANT is visible to the granted user's
  next query) — the coordinator-lifetime scope of the reference's
  AccessControlManager.
- Enforcement is OPT-IN per session (``enforce=True``): the reference only
  enforces when a system access control is configured; the default
  ``AllowAllAccessControl`` matches ``enforce=False``, while the grant
  bookkeeping statements work in both modes (connectors record grants even
  when the system policy is allow-all).
"""

from __future__ import annotations

from dataclasses import dataclass, field

PRIVILEGES = ("SELECT", "INSERT", "DELETE", "UPDATE")
PUBLIC = "public"


class AccessDeniedError(PermissionError):
    """Presto surfaces AccessDeniedException with a 'Access Denied:' prefix."""


@dataclass(frozen=True)
class _Grantee:
    kind: str  # 'USER' | 'ROLE'
    name: str


@dataclass
class _TableGrant:
    grantable: bool = False


@dataclass
class AccessControl:
    """Role + table-privilege store (AccessControlManager analog)."""

    admins: set[str] = field(default_factory=lambda: {"admin"})
    _roles: set[str] = field(default_factory=set)
    # role memberships: grantee -> set of role names granted to it
    _memberships: dict[_Grantee, set[str]] = field(default_factory=dict)
    # (grantee, table) -> {privilege -> _TableGrant}
    _grants: dict[tuple[_Grantee, str], dict[str, _TableGrant]] = field(default_factory=dict)

    # -- roles ---------------------------------------------------------------

    def create_role(self, role: str, user: str, enforce: bool) -> None:
        role = role.lower()
        if enforce and user not in self.admins:
            raise AccessDeniedError(f"Access Denied: Cannot create role {role}")
        if role in self._roles or role == PUBLIC:
            raise ValueError(f"Role '{role}' already exists")
        self._roles.add(role)

    def drop_role(self, role: str, user: str, enforce: bool) -> None:
        role = role.lower()
        if enforce and user not in self.admins:
            raise AccessDeniedError(f"Access Denied: Cannot drop role {role}")
        if role not in self._roles:
            raise ValueError(f"Role '{role}' does not exist")
        self._roles.discard(role)
        for members in self._memberships.values():
            members.discard(role)
        # drop the role's own memberships and table grants too — otherwise
        # CREATE ROLE of the same name later silently resurrects the old
        # role's privileges (the reference drops grants with the role)
        self._memberships.pop(_Grantee("ROLE", role), None)
        for key in [k for k in self._grants if k[0] == _Grantee("ROLE", role)]:
            del self._grants[key]

    def roles(self) -> list[str]:
        return sorted(self._roles)

    def grant_role(self, role: str, kind: str, grantee: str, user: str, enforce: bool) -> None:
        role = role.lower()
        if enforce and user not in self.admins:
            raise AccessDeniedError(f"Access Denied: Cannot grant role {role}")
        if role not in self._roles:
            raise ValueError(f"Role '{role}' does not exist")
        g = _Grantee(kind.upper(), grantee.lower())
        self._memberships.setdefault(g, set()).add(role)

    def revoke_role(self, role: str, kind: str, grantee: str, user: str, enforce: bool) -> None:
        role = role.lower()
        if enforce and user not in self.admins:
            raise AccessDeniedError(f"Access Denied: Cannot revoke role {role}")
        g = _Grantee(kind.upper(), grantee.lower())
        if role not in self._memberships.get(g, set()):
            raise ValueError(f"Role '{role}' has not been granted to {grantee}")
        self._memberships[g].discard(role)

    def roles_of(self, user: str) -> set[str]:
        """All roles reachable from ``user`` (transitive closure + PUBLIC)."""
        out: set[str] = {PUBLIC}
        frontier = list(self._memberships.get(_Grantee("USER", user.lower()), set()))
        while frontier:
            r = frontier.pop()
            if r in out:
                continue
            out.add(r)
            frontier.extend(self._memberships.get(_Grantee("ROLE", r), set()))
        return out

    # -- table privileges ----------------------------------------------------

    def _can_grant(self, user: str, priv: str, table: str) -> bool:
        if user in self.admins:
            return True
        for g in self._effective_grantees(user, self.roles_of(user)):
            tg = self._grants.get((g, table), {}).get(priv)
            if tg is not None and tg.grantable:
                return True
        return False

    def grant(
        self,
        privs: list[str],
        table: str,
        kind: str,
        grantee: str,
        user: str,
        enforce: bool,
        grant_option: bool = False,
    ) -> None:
        table = table.lower()
        privs = _expand(privs)
        if enforce:
            for p in privs:
                if not self._can_grant(user, p, table):
                    raise AccessDeniedError(f"Access Denied: Cannot grant {p} on {table}")
        g = _Grantee(kind.upper(), grantee.lower())
        slot = self._grants.setdefault((g, table), {})
        for p in privs:
            tg = slot.setdefault(p, _TableGrant())
            tg.grantable = tg.grantable or grant_option

    def revoke(
        self,
        privs: list[str],
        table: str,
        kind: str,
        grantee: str,
        user: str,
        enforce: bool,
        grant_option_for: bool = False,
    ) -> None:
        table = table.lower()
        privs = _expand(privs)
        if enforce:
            for p in privs:
                if not self._can_grant(user, p, table):
                    raise AccessDeniedError(f"Access Denied: Cannot revoke {p} on {table}")
        g = _Grantee(kind.upper(), grantee.lower())
        slot = self._grants.get((g, table), {})
        for p in privs:
            if grant_option_for:
                if p in slot:
                    slot[p].grantable = False
            else:
                slot.pop(p, None)

    def _effective_grantees(self, user: str, roles: set[str]) -> list[_Grantee]:
        return [_Grantee("USER", user.lower())] + [_Grantee("ROLE", r) for r in sorted(roles)]

    def check(self, user: str, roles: set[str], priv: str, table: str) -> None:
        """Raise AccessDeniedError unless ``user`` (or an enabled role)
        holds ``priv`` on ``table`` — AccessControlManager.checkCan*."""
        if user in self.admins:
            return
        table = table.lower()
        for g in self._effective_grantees(user, roles):
            if priv in self._grants.get((g, table), {}):
                return
        raise AccessDeniedError(f"Access Denied: Cannot {priv.lower()} from table {table}")

    def grants_for(self, user: str, roles: set[str], table: str | None = None) -> list[tuple]:
        """SHOW GRANTS rows — information_schema.table_privileges shape
        (grantee, grantee_type, privilege_type, table_name, is_grantable)."""
        rows = []
        wanted = self._effective_grantees(user, roles)
        for (g, tbl), privs in sorted(
            self._grants.items(), key=lambda kv: (kv[0][1], kv[0][0].kind, kv[0][0].name)
        ):
            if g not in wanted:
                continue
            if table is not None and tbl != table.lower():
                continue
            for p in sorted(privs):
                rows.append((g.name, g.kind, p, tbl, privs[p].grantable))
        return rows


def _expand(privs: list[str]) -> list[str]:
    out: list[str] = []
    for p in privs:
        p = p.strip().upper()
        if p in ("ALL", "ALL PRIVILEGES"):
            out.extend(PRIVILEGES)
        elif p in PRIVILEGES:
            out.append(p)
        else:
            raise ValueError(f"Unknown privilege: {p}")
    return out
