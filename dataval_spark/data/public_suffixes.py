"""Embedded snapshot of the Public Suffix List (publicsuffix.org).

The PSL is PUBLIC data (Mozilla-maintained, MPL 2.0) in a plain-text
rule format: one rule per line, ``//`` comments, ``*.`` wildcard rules,
``!`` exception rules. This module embeds a CURATED SNAPSHOT — the
high-traffic ICANN country second-level registries plus the common
private-section hosting suffixes — rather than the full ~10k-rule file,
so the package stays self-contained under ``spark-submit --py-files``
(package.py zips only ``.py`` files; a Python string literal is zip-safe
everywhere a data file is not).

Production seam: ``urls.load_suffix_rules(path=...)`` parses a full
downloaded ``public_suffix_list.dat`` with exactly this grammar — drop
the real file next to the job and pass its path; nothing else changes.

Known snapshot gaps (by construction): most nested US locality rules
(k12.<state>.us, cc/lib.<state>.us), IDN/unicode rules, the long tail of
private-section entries, and any registry changes after the snapshot.
"""

PSL_SNAPSHOT = """\
// ---- ICANN section (curated) ----
// United Kingdom
co.uk
org.uk
me.uk
ltd.uk
plc.uk
net.uk
sch.uk
ac.uk
gov.uk
nhs.uk
police.uk
// Japan
co.jp
ne.jp
or.jp
ac.jp
ad.jp
ed.jp
go.jp
gr.jp
lg.jp
// Australia
com.au
net.au
org.au
edu.au
gov.au
asn.au
id.au
// New Zealand
co.nz
net.nz
org.nz
govt.nz
ac.nz
school.nz
geek.nz
gen.nz
maori.nz
// South Africa
co.za
net.za
org.za
gov.za
ac.za
edu.za
web.za
// India
co.in
net.in
org.in
gov.in
ac.in
edu.in
res.in
gen.in
firm.in
ind.in
nic.in
mil.in
// Indonesia
co.id
net.id
or.id
go.id
ac.id
web.id
sch.id
my.id
// Thailand
co.th
in.th
or.th
go.th
ac.th
mi.th
net.th
// South Korea
co.kr
ne.kr
or.kr
go.kr
ac.kr
re.kr
pe.kr
// Singapore
com.sg
net.sg
org.sg
gov.sg
edu.sg
per.sg
// Malaysia
com.my
net.my
org.my
gov.my
edu.my
mil.my
name.my
// Philippines
com.ph
net.ph
org.ph
gov.ph
edu.ph
ngo.ph
mil.ph
i.ph
// Vietnam
com.vn
net.vn
org.vn
gov.vn
edu.vn
ac.vn
biz.vn
info.vn
name.vn
int.vn
pro.vn
health.vn
// Taiwan
com.tw
net.tw
org.tw
gov.tw
edu.tw
mil.tw
idv.tw
game.tw
club.tw
ebiz.tw
// Hong Kong
com.hk
net.hk
org.hk
gov.hk
edu.hk
idv.hk
// China
com.cn
net.cn
org.cn
gov.cn
edu.cn
ac.cn
mil.cn
// Brazil
com.br
net.br
org.br
gov.br
edu.br
mil.br
art.br
adv.br
// Mexico
com.mx
net.mx
org.mx
gob.mx
edu.mx
// Argentina
com.ar
net.ar
org.ar
gob.ar
edu.ar
int.ar
mil.ar
tur.ar
musica.ar
// Colombia
com.co
net.co
org.co
gov.co
edu.co
mil.co
nom.co
// Peru
com.pe
net.pe
org.pe
gob.pe
edu.pe
mil.pe
nom.pe
// Chile
gob.cl
gov.cl
mil.cl
co.cl
// Venezuela
com.ve
net.ve
org.ve
gob.ve
edu.ve
co.ve
info.ve
web.ve
// Ecuador
com.ec
net.ec
org.ec
gob.ec
edu.ec
fin.ec
med.ec
pro.ec
info.ec
// Uruguay
com.uy
net.uy
org.uy
gub.uy
edu.uy
mil.uy
// Paraguay
com.py
net.py
org.py
gov.py
edu.py
mil.py
coop.py
// Bolivia
com.bo
net.bo
org.bo
gob.bo
edu.bo
mil.bo
int.bo
tv.bo
web.bo
// Turkey
com.tr
net.tr
org.tr
gov.tr
edu.tr
bel.tr
biz.tr
info.tr
av.tr
dr.tr
k12.tr
pol.tr
// Israel
co.il
org.il
net.il
ac.il
gov.il
k12.il
muni.il
idf.il
// Saudi Arabia
com.sa
net.sa
org.sa
gov.sa
edu.sa
med.sa
pub.sa
sch.sa
// Egypt
com.eg
net.eg
org.eg
gov.eg
edu.eg
sci.eg
eun.eg
mil.eg
name.eg
info.eg
// Nigeria
com.ng
net.ng
org.ng
gov.ng
edu.ng
sch.ng
name.ng
mobi.ng
mil.ng
i.ng
// Kenya
co.ke
or.ke
ne.ke
go.ke
ac.ke
sc.ke
info.ke
me.ke
mobi.ke
// Ghana
com.gh
org.gh
gov.gh
edu.gh
mil.gh
// Tanzania
co.tz
or.tz
go.tz
ac.tz
ne.tz
sc.tz
hotel.tz
info.tz
me.tz
mobi.tz
tv.tz
// Uganda
co.ug
com.ug
or.ug
org.ug
go.ug
ac.ug
ne.ug
sc.ug
// Zambia
co.zm
com.zm
org.zm
gov.zm
edu.zm
ac.zm
sch.zm
// Zimbabwe
co.zw
org.zw
gov.zw
ac.zw
// Ethiopia
com.et
org.et
gov.et
edu.et
net.et
biz.et
name.et
info.et
// Morocco
co.ma
net.ma
org.ma
gov.ma
ac.ma
press.ma
// Algeria
com.dz
org.dz
net.dz
gov.dz
edu.dz
asso.dz
art.dz
pol.dz
// Tunisia
com.tn
net.tn
org.tn
gov.tn
// Poland
com.pl
net.pl
org.pl
edu.pl
gov.pl
info.pl
waw.pl
biz.pl
mil.pl
// Ukraine
com.ua
net.ua
org.ua
gov.ua
edu.ua
in.ua
kiev.ua
kyiv.ua
// Russia
ac.ru
edu.ru
gov.ru
int.ru
mil.ru
com.ru
net.ru
org.ru
pp.ru
msk.ru
spb.ru
// Belarus
com.by
of.by
gov.by
mil.by
// Kazakhstan
com.kz
net.kz
org.kz
gov.kz
edu.kz
mil.kz
// Uzbekistan
co.uz
com.uz
// Georgia
com.ge
net.ge
org.ge
gov.ge
edu.ge
pvt.ge
// Azerbaijan
com.az
net.az
org.az
gov.az
edu.az
int.az
mil.az
name.az
pro.az
biz.az
info.az
// Iran
co.ir
net.ir
org.ir
gov.ir
ac.ir
id.ir
sch.ir
// Pakistan
com.pk
net.pk
org.pk
gov.pk
edu.pk
fam.pk
biz.pk
web.pk
// Bangladesh
com.bd
net.bd
org.bd
gov.bd
edu.bd
ac.bd
mil.bd
// Sri Lanka
com.lk
net.lk
org.lk
gov.lk
edu.lk
int.lk
ac.lk
sch.lk
ngo.lk
soc.lk
web.lk
ltd.lk
grp.lk
hotel.lk
assn.lk
// Myanmar
com.mm
net.mm
org.mm
gov.mm
edu.mm
// El Salvador
com.sv
org.sv
gob.sv
edu.sv
red.sv
// Guatemala
com.gt
net.gt
org.gt
gob.gt
edu.gt
ind.gt
mil.gt
// Costa Rica
co.cr
ac.cr
ed.cr
fi.cr
go.cr
or.cr
sa.cr
// Nicaragua
com.ni
net.ni
org.ni
gob.ni
edu.ni
ac.ni
int.ni
mil.ni
nom.ni
// Honduras
com.hn
net.hn
org.hn
gob.hn
edu.hn
mil.hn
// Dominican Republic
com.do
net.do
org.do
gob.do
edu.do
gov.do
mil.do
sld.do
art.do
web.do
// Cuba
com.cu
edu.cu
org.cu
net.cu
gov.cu
inf.cu
// Puerto Rico
com.pr
net.pr
org.pr
gov.pr
edu.pr
isla.pr
pro.pr
biz.pr
info.pr
name.pr
est.pr
prof.pr
ac.pr
// Spain
com.es
nom.es
org.es
gob.es
edu.es
// Portugal
com.pt
net.pt
org.pt
gov.pt
edu.pt
int.pt
publ.pt
nome.pt
// Italy
gov.it
edu.it
// France
asso.fr
com.fr
gouv.fr
nom.fr
prd.fr
tm.fr
// Greece
com.gr
net.gr
org.gr
gov.gr
edu.gr
// Romania
com.ro
org.ro
store.ro
tm.ro
nt.ro
nom.ro
info.ro
rec.ro
arts.ro
firm.ro
www.ro
// Hungary
co.hu
info.hu
org.hu
priv.hu
tm.hu
// Austria
co.at
or.at
ac.at
gv.at
priv.at
// Belgium
ac.be
// Estonia
com.ee
org.ee
fie.ee
pri.ee
// Latvia
com.lv
net.lv
org.lv
gov.lv
edu.lv
asn.lv
conf.lv
id.lv
mil.lv
// Lithuania
gov.lt
// Serbia
co.rs
org.rs
edu.rs
ac.rs
gov.rs
in.rs
// Croatia
com.hr
// Iceland
net.is
com.is
edu.is
gov.is
org.is
int.is
// Ireland
gov.ie
// Malta
com.mt
net.mt
org.mt
edu.mt
gov.mt
// Cyprus
ac.cy
com.cy
gov.cy
net.cy
org.cy
ltd.cy
// Canada (provinces + federal)
ab.ca
bc.ca
mb.ca
nb.ca
nf.ca
nl.ca
ns.ca
nt.ca
nu.ca
on.ca
pe.ca
qc.ca
sk.ca
yk.ca
gc.ca
// United States (state second-levels; nested k12/cc/lib rules omitted)
ak.us
al.us
ar.us
az.us
ca.us
co.us
ct.us
dc.us
de.us
fl.us
ga.us
hi.us
ia.us
id.us
il.us
in.us
ks.us
ky.us
la.us
ma.us
md.us
me.us
mi.us
mn.us
mo.us
ms.us
mt.us
nc.us
nd.us
ne.us
nh.us
nj.us
nm.us
nv.us
ny.us
oh.us
ok.us
or.us
pa.us
ri.us
sc.us
sd.us
tn.us
tx.us
ut.us
va.us
vt.us
wa.us
wi.us
wv.us
wy.us
// Fiji
com.fj
net.fj
org.fj
gov.fj
ac.fj
// Brunei
com.bn
edu.bn
gov.bn
net.bn
org.bn
// Wildcard registries (every label under the TLD is a public suffix)
*.ck
!www.ck
*.er
*.kh
*.np
// ---- Private section (curated) ----
github.io
githubusercontent.com
gitlab.io
blogspot.com
appspot.com
herokuapp.com
firebaseapp.com
web.app
netlify.app
vercel.app
pages.dev
workers.dev
azurewebsites.net
cloudfront.net
s3.amazonaws.com
compute.amazonaws.com
readthedocs.io
surge.sh
glitch.me
onrender.com
fly.dev
deno.dev
neocities.org
wordpress.com
weebly.com
wixsite.com
"""
