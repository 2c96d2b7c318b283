# One-shot catalog generator, part 2: the remaining reference languages
# (hu, ro_RO, sr, nb_NO, zh_TW, eu_ES, es_AR — completing ALL_LINGUAS,
# /root/reference/configure.ac:91). zh_TW derives from zh_CN by
# traditional-character conversion of this domain's fixed vocabulary;
# es_AR derives from es with regional adjustments.
import json
import os

# order: hu, ro_RO, sr, nb_NO, eu_ES
T = {
 "--delta-x {v} out of range 0..{hi}": [
  "--delta-x {v} a 0..{hi} tartományon kívül esik",
  "--delta-x {v} în afara intervalului 0..{hi}",
  "--delta-x {v} је изван опсега 0..{hi}",
  "--delta-x {v} utenfor området 0..{hi}",
  "--delta-x {v} 0..{hi} tartetik kanpo"],
 "--enl-step {v} out of range {lo:g}..{hi:g} (percent)": [
  "--enl-step {v} a {lo:g}..{hi:g} tartományon kívül esik (százalék)",
  "--enl-step {v} în afara intervalului {lo:g}..{hi:g} (procente)",
  "--enl-step {v} је изван опсега {lo:g}..{hi:g} (проценти)",
  "--enl-step {v} utenfor området {lo:g}..{hi:g} (prosent)",
  "--enl-step {v} {lo:g}..{hi:g} tartetik kanpo (ehunekoa)"],
 "--rigidity {v} out of range 0..{hi:g}": [
  "--rigidity {v} a 0..{hi:g} tartományon kívül esik",
  "--rigidity {v} în afara intervalului 0..{hi:g}",
  "--rigidity {v} је изван опсега 0..{hi:g}",
  "--rigidity {v} utenfor området 0..{hi:g}",
  "--rigidity {v} 0..{hi:g} tartetik kanpo"],
 "--seam-colors {v!r} is not 6 comma-separated floats R1,G1,B1,R2,G2,B2": [
  "--seam-colors {v!r} nem 6 vesszővel elválasztott szám R1,G1,B1,R2,G2,B2",
  "--seam-colors {v!r} nu este format din 6 numere separate prin virgulă R1,G1,B1,R2,G2,B2",
  "--seam-colors {v!r} није 6 бројева раздвојених зарезима R1,G1,B1,R2,G2,B2",
  "--seam-colors {v!r} er ikke 6 kommaseparerte tall R1,G1,B1,R2,G2,B2",
  "--seam-colors {v!r} ez da komaz bereizitako 6 zenbaki R1,G1,B1,R2,G2,B2"],
 "--{name} {v} out of range 0..{hi}": [
  "--{name} {v} a 0..{hi} tartományon kívül esik",
  "--{name} {v} în afara intervalului 0..{hi}",
  "--{name} {v} је изван опсега 0..{hi}",
  "--{name} {v} utenfor området 0..{hi}",
  "--{name} {v} 0..{hi} tartetik kanpo"],
 "BatchCarver needs at least one image": [
  "A BatchCarver legalább egy képet igényel",
  "BatchCarver necesită cel puțin o imagine",
  "BatchCarver захтева бар једну слику",
  "BatchCarver trenger minst ett bilde",
  "BatchCarver-ek gutxienez irudi bat behar du"],
 "Resizing height...": [
  "Magasság átméretezése...",
  "Se redimensionează înălțimea...",
  "Промена висине...",
  "Endrer høyde...",
  "Altuera aldatzen..."],
 "Resizing width...": [
  "Szélesség átméretezése...",
  "Se redimensionează lățimea...",
  "Промена ширине...",
  "Endrer bredde...",
  "Zabalera aldatzen..."],
 "animate: height keyframe for the last frame": [
  "animáció: magasság-kulcsérték az utolsó képkockához",
  "animație: înălțimea-cheie pentru ultimul cadru",
  "анимација: кључна висина за последњи кадар",
  "animasjon: høyde-nøkkelbilde for siste bilde",
  "animazioa: azken fotogramarako altuera gakoa"],
 "animate: width keyframe for the last frame": [
  "animáció: szélesség-kulcsérték az utolsó képkockához",
  "animație: lățimea-cheie pentru ultimul cadru",
  "анимација: кључна ширина за последњи кадар",
  "animasjon: bredde-nøkkelbilde for siste bilde",
  "animazioa: azken fotogramarako zabalera gakoa"],
 "attached aux carver is {aw}x{ah}, main image is {w}x{h}; attached carvers must match the main size": [
  "a csatolt segéd-faragó {aw}x{ah}, a fő kép {w}x{h}; a csatolt faragóknak a fő mérettel kell egyezniük",
  "carver-ul auxiliar atașat este {aw}x{ah}, imaginea principală este {w}x{h}; carverele atașate trebuie să corespundă dimensiunii principale",
  "приложени помоћни карвер је {aw}x{ah}, главна слика је {w}x{h}; приложени карвери морају одговарати главној величини",
  "vedlagt hjelpe-carver er {aw}x{ah}, hovedbildet er {w}x{h}; vedlagte carvere må samsvare med hovedstørrelsen",
  "erantsitako carver laguntzailea {aw}x{ah} da, irudi nagusia {w}x{h}; erantsitako carverrek tamaina nagusiarekin bat etorri behar dute"],
 "aux {j} of image {i} is {aw}x{ah}, image is {w}x{h}": [
  "a(z) {i}. kép {j}. segédrétege {aw}x{ah}, a kép {w}x{h}",
  "auxiliarul {j} al imaginii {i} este {aw}x{ah}, imaginea este {w}x{h}",
  "помоћни {j} слике {i} је {aw}x{ah}, слика је {w}x{h}",
  "hjelpelag {j} for bilde {i} er {aw}x{ah}, bildet er {w}x{h}",
  "{i} irudiaren {j} laguntzailea {aw}x{ah} da, irudia {w}x{h} da"],
 "batch of {B} images cannot shard evenly over {n} 'data' devices; pad the batch to a multiple of {n}": [
  "{B} képből álló köteg nem osztható el egyenlően {n} 'data' eszközön; egészítse ki a köteget {n} többszörösére",
  "un lot de {B} imagini nu se poate împărți uniform pe {n} dispozitive 'data'; completați lotul la un multiplu de {n}",
  "група од {B} слика не може се равномерно поделити на {n} 'data' уређаја; допуните групу до умношка броја {n}",
  "en bunke på {B} bilder kan ikke fordeles jevnt over {n} 'data'-enheter; fyll bunken til et multiplum av {n}",
  "{B} irudiko sorta ezin da uniformeki banatu {n} 'data' gailutan; osatu sorta {n}-ren multiplo batera"],
 "column sharding requires equal image heights (pad or batch same-height images together)": [
  "az oszlopos felosztás azonos képmagasságokat igényel (egészítse ki vagy kötegeljen azonos magasságú képeket)",
  "sharding-ul pe coloane necesită înălțimi egale ale imaginilor (completați sau grupați imagini de aceeași înălțime)",
  "подела по колонама захтева једнаке висине слика (допуните или групишите слике исте висине)",
  "kolonnedeling krever like bildehøyder (fyll ut eller grupper bilder med samme høyde)",
  "zutabekako banaketak irudi-altuera berdinak eskatzen ditu (osatu edo multzokatu altuera bereko irudiak)"],
 "delta_x={v} out of range 0..{hi}": [
  "delta_x={v} a 0..{hi} tartományon kívül esik",
  "delta_x={v} în afara intervalului 0..{hi}",
  "delta_x={v} је изван опсега 0..{hi}",
  "delta_x={v} utenfor området 0..{hi}",
  "delta_x={v} 0..{hi} tartetik kanpo"],
 "dialog reported a fatal state": [
  "a párbeszédablak végzetes állapotot jelentett",
  "dialogul a raportat o stare fatală",
  "дијалог је пријавио фаталнo стање",
  "dialogen rapporterte en fatal tilstand",
  "elkarrizketa-koadroak egoera larria jakinarazi du"],
 "discard mask": [
  "eldobási maszk", "mască de eliminare", "маска одбацивања",
  "forkastingsmaske", "baztertze-maskara"],
 "discard mask image file": [
  "eldobási maszk képfájlja",
  "fișierul imagine al măștii de eliminare",
  "датотека слике маске одбацивања",
  "bildefil for forkastingsmaske",
  "baztertze-maskararen irudi-fitxategia"],
 "do NOT ignore the discard mask when enlarging": [
  "NE hagyja figyelmen kívül az eldobási maszkot nagyításkor",
  "NU ignora masca de eliminare la mărire",
  "НЕ занемаруј маску одбацивања при увећању",
  "IKKE ignorer forkastingsmasken ved forstørrelse",
  "EZ baztertu baztertze-maskara handitzean"],
 "done in {seconds:.2f}s": [
  "kész {seconds:.2f} mp alatt",
  "gata în {seconds:.2f}s",
  "готово за {seconds:.2f}s",
  "ferdig på {seconds:.2f}s",
  "{seconds:.2f}s-tan eginda"],
 "enl_step={v} out of range [{lo}, {hi}] (100.1%-200%)": [
  "enl_step={v} a [{lo}, {hi}] tartományon kívül esik (100,1%-200%)",
  "enl_step={v} în afara intervalului [{lo}, {hi}] (100,1%-200%)",
  "enl_step={v} је изван опсега [{lo}, {hi}] (100,1%-200%)",
  "enl_step={v} utenfor området [{lo}, {hi}] (100,1%-200%)",
  "enl_step={v} [{lo}, {hi}] tartetik kanpo (%100,1-%200)"],
 "error": ["hiba", "eroare", "грешка", "feil", "errorea"],
 "every image must attach the same number of aux carvers": [
  "minden képhez azonos számú segéd-faragót kell csatolni",
  "fiecare imagine trebuie să atașeze același număr de carvere auxiliare",
  "свака слика мора приложити исти број помоћних карвера",
  "hvert bilde må ha samme antall hjelpe-carvere",
  "irudi bakoitzak carver laguntzaile kopuru bera erantsi behar du"],
 "final height: pixels or percent (optional with --last)": [
  "végső magasság: képpont vagy százalék (--last mellett elhagyható)",
  "înălțimea finală: pixeli sau procente (opțional cu --last)",
  "коначна висина: пиксели или проценти (необавезно уз --last)",
  "endelig høyde: piksler eller prosent (valgfritt med --last)",
  "azken altuera: pixelak edo ehunekoa (aukerakoa --last-ekin)"],
 "final width: pixels or percent like 75%% (optional with --last)": [
  "végső szélesség: képpont vagy százalék, pl. 75%% (--last mellett elhagyható)",
  "lățimea finală: pixeli sau procente precum 75%% (opțional cu --last)",
  "коначна ширина: пиксели или проценти, нпр. 75%% (необавезно уз --last)",
  "endelig bredde: piksler eller prosent som 75%% (valgfritt med --last)",
  "azken zabalera: pixelak edo ehunekoa, adib. 75%% (aukerakoa --last-ekin)"],
 "force pure-JAX (no Pallas) path": [
  "tiszta JAX (Pallas nélküli) útvonal kényszerítése",
  "forțează calea JAX pură (fără Pallas)",
  "принуди чисту JAX путању (без Pallas-а)",
  "tving ren JAX-bane (uten Pallas)",
  "behartu JAX hutsezko bidea (Pallas gabe)"],
 "g++ failed building the native reference carver ({src}):\n{err}": [
  "a g++ nem tudta lefordítani a natív referencia-faragót ({src}):\n{err}",
  "g++ nu a reușit să compileze carver-ul de referință nativ ({src}):\n{err}",
  "g++ није успео да изгради нативни референтни карвер ({src}):\n{err}",
  "g++ klarte ikke å bygge den native referanse-carveren ({src}):\n{err}",
  "g++-ek ezin izan du erreferentziazko carver natiboa eraiki ({src}):\n{err}"],
 "height": ["magasság", "înălțime", "висина", "høyde", "altuera"],
 "image changed under the interactive session (layer removed or its type changed); the session cannot continue": [
  "a kép megváltozott az interaktív munkamenet alatt (réteg törölve vagy típusa megváltozott); a munkamenet nem folytatható",
  "imaginea s-a schimbat în timpul sesiunii interactive (strat eliminat sau tip schimbat); sesiunea nu poate continua",
  "слика се променила током интерактивне сесије (слој уклоњен или му је промењен тип); сесија не може да се настави",
  "bildet ble endret under den interaktive økten (lag fjernet eller typen endret); økten kan ikke fortsette",
  "irudia aldatu da saio interaktiboan (geruza kendu da edo mota aldatu da); saioak ezin du jarraitu"],
 "image {i} has {c} channels, batch has {C}": [
  "a(z) {i}. képnek {c} csatornája van, a kötegnek {C}",
  "imaginea {i} are {c} canale, lotul are {C}",
  "слика {i} има {c} канала, група има {C}",
  "bilde {i} har {c} kanaler, bunken har {C}",
  "{i} irudiak {c} kanal ditu, sortak {C}"],
 "input image file(s)": [
  "bemeneti képfájl(ok)",
  "fișier(e) imagine de intrare",
  "улазне датотеке слика",
  "inndata-bildefil(er)",
  "sarrerako irudi-fitxategia(k)"],
 "interactive run requires a dialog driver": [
  "az interaktív futtatáshoz párbeszéd-illesztő szükséges",
  "rularea interactivă necesită un driver de dialog",
  "интерактивно покретање захтева управљач дијалога",
  "interaktiv kjøring krever en dialogdriver",
  "exekuzio interaktiboak elkarrizketa-kontrolatzaile bat behar du"],
 "internal: dropping a map with carved seams — this is a bug; callers must flatten first": [
  "belső: faragott varratokat tartalmazó térkép eldobása — ez hiba; előbb lapítani kell",
  "intern: se renunță la o hartă cu cusături sculptate — acesta este un bug; trebuie aplatizat mai întâi",
  "интерно: одбацивање мапе са изрезаним шавовима — ово је грешка; прво се мора израванати",
  "internt: forkaster et kart med skårne sømmer — dette er en feil; må flates ut først",
  "barnekoa: zizelkatutako joskurak dituen mapa baztertzen — akats bat da; lehenik lautu behar da"],
 "layer {name!r} is not selectable as a mask (must belong to the image and not be the active layer)": [
  "a(z) {name!r} réteg nem választható maszknak (a képhez kell tartoznia, és nem lehet az aktív réteg)",
  "stratul {name!r} nu poate fi selectat ca mască (trebuie să aparțină imaginii și să nu fie stratul activ)",
  "слој {name!r} не може се изабрати као маска (мора припадати слици и не сме бити активни слој)",
  "laget {name!r} kan ikke velges som maske (må tilhøre bildet og ikke være det aktive laget)",
  "{name!r} geruza ezin da maskara gisa hautatu (irudiarena izan behar du eta ezin da geruza aktiboa izan)"],
 "map: {axis}, reference {ref} (image {w}x{h}), depth {depth}, range [{lo}, {hi}], next step at {step}": [
  "térkép: {axis}, referencia {ref} (kép {w}x{h}), mélység {depth}, tartomány [{lo}, {hi}], következő lépés: {step}",
  "hartă: {axis}, referință {ref} (imagine {w}x{h}), adâncime {depth}, interval [{lo}, {hi}], pasul următor la {step}",
  "мапа: {axis}, референца {ref} (слика {w}x{h}), дубина {depth}, опсег [{lo}, {hi}], следећи корак на {step}",
  "kart: {axis}, referanse {ref} (bilde {w}x{h}), dybde {depth}, område [{lo}, {hi}], neste trinn ved {step}",
  "mapa: {axis}, erreferentzia {ref} (irudia {w}x{h}), sakonera {depth}, tartea [{lo}, {hi}], hurrengo urratsa {step}-(e)n"],
 "mask edit session already closed": [
  "a maszkszerkesztési munkamenet már lezárult",
  "sesiunea de editare a măștii este deja închisă",
  "сесија уређивања маске је већ затворена",
  "maskeredigeringsøkten er allerede lukket",
  "maskara editatzeko saioa dagoeneko itxita dago"],
 "max enlargement per step, percent (default 150)": [
  "lépésenkénti legnagyobb nagyítás, százalék (alapértelmezés: 150)",
  "mărirea maximă pe pas, procente (implicit 150)",
  "највеће увећање по кораку, проценти (подразумевано 150)",
  "maksimal forstørrelse per trinn, prosent (standard 150)",
  "urratseko gehienezko handitzea, ehunekoa (lehenetsia 150)"],
 "no last-used size is stored": [
  "nincs eltárolt utoljára használt méret",
  "nu este stocată nicio dimensiune folosită anterior",
  "није сачувана последња коришћена величина",
  "ingen sist brukte størrelse er lagret",
  "ez dago azken aldiz erabilitako tamainarik gordeta"],
 "no such file: {path}": [
  "nincs ilyen fájl: {path}",
  "fișier inexistent: {path}",
  "нема такве датотеке: {path}",
  "finner ikke filen: {path}",
  "ez dago horrelako fitxategirik: {path}"],
 "no {type} mask selected to edit": [
  "nincs kiválasztott {type} maszk a szerkesztéshez",
  "nicio mască {type} selectată pentru editare",
  "није изабрана {type} маска за уређивање",
  "ingen {type}-maske valgt for redigering",
  "ez da editatzeko {type} maskararik hautatu"],
 "noninteractive run requires a full config": [
  "a nem interaktív futtatáshoz teljes konfiguráció szükséges",
  "rularea neinteractivă necesită o configurație completă",
  "неинтерактивно покретање захтева потпуну конфигурацију",
  "ikke-interaktiv kjøring krever full konfigurasjon",
  "exekuzio ez-interaktiboak konfigurazio osoa behar du"],
 "offset {s!r} is not of the form X,Y (integers)": [
  "a(z) {s!r} eltolás nem X,Y alakú (egész számok)",
  "decalajul {s!r} nu are forma X,Y (numere întregi)",
  "померај {s!r} није облика X,Y (цели бројеви)",
  "forskyvningen {s!r} er ikke på formen X,Y (heltall)",
  "{s!r} desplazamendua ez da X,Y formakoa (zenbaki osoak)"],
 "output directory (multiple inputs)": [
  "kimeneti könyvtár (több bemenet)",
  "director de ieșire (intrări multiple)",
  "излазни директоријум (више улаза)",
  "utdatakatalog (flere inndata)",
  "irteerako direktorioa (sarrera anitz)"],
 "output file (single input)": [
  "kimeneti fájl (egyetlen bemenet)",
  "fișier de ieșire (o singură intrare)",
  "излазна датотека (један улаз)",
  "utdatafil (én inndata)",
  "irteerako fitxategia (sarrera bakarra)"],
 "output the seam map(s)": [
  "varrattérkép(ek) kiírása",
  "generează harta/hărțile de cusături",
  "испиши мапе шавова",
  "skriv ut sømkart",
  "joskura-mapak sortu"],
 "paint region {got} does not match mask layer {want}": [
  "a festett terület ({got}) nem egyezik a maszkréteggel ({want})",
  "regiunea pictată {got} nu corespunde stratului de mască {want}",
  "обојена област {got} не одговара слоју маске {want}",
  "malt område {got} samsvarer ikke med maskelaget {want}",
  "margotutako eskualdea ({got}) ez dator bat maskara-geruzarekin ({want})"],
 "percent sizes cannot combine with --gap-* keyframes": [
  "a százalékos méretek nem kombinálhatók --gap-* kulcskockákkal",
  "dimensiunile procentuale nu se pot combina cu cadrele-cheie --gap-*",
  "величине у процентима не могу се комбиновати са --gap-* кључним кадровима",
  "prosentstørrelser kan ikke kombineres med --gap-*-nøkkelbilder",
  "ehuneko-tamainak ezin dira --gap-* gako-fotogramekin konbinatu"],
 "persist this run's settings for --last replay": [
  "a futtatás beállításainak mentése --last visszajátszáshoz",
  "păstrează setările acestei rulări pentru reluarea cu --last",
  "сачувај подешавања овог покретања за понављање уз --last",
  "lagre denne kjøringens innstillinger for --last-avspilling",
  "gorde exekuzio honen ezarpenak --last errepikapenerako"],
 "preservation mask": [
  "megőrzési maszk", "mască de păstrare", "маска очувања",
  "bevaringsmaske", "gordetze-maskara"],
 "preservation mask image file": [
  "megőrzési maszk képfájlja",
  "fișierul imagine al măștii de păstrare",
  "датотека слике маске очувања",
  "bildefil for bevaringsmaske",
  "gordetze-maskararen irudi-fitxategia"],
 "render failed": [
  "a renderelés nem sikerült", "randarea a eșuat",
  "исцртавање није успело", "rendering mislyktes",
  "errendatzeak huts egin du"],
 "render failed for {path}": [
  "a renderelés nem sikerült: {path}",
  "randarea a eșuat pentru {path}",
  "исцртавање није успело за {path}",
  "rendering mislyktes for {path}",
  "errendatzeak huts egin du: {path}"],
 "replay the last saved settings (RUN_WITH_LAST_VALS; aux masks matched by name)": [
  "az utoljára mentett beállítások visszajátszása (RUN_WITH_LAST_VALS; segédmaszkok név szerint párosítva)",
  "reia ultimele setări salvate (RUN_WITH_LAST_VALS; măștile auxiliare potrivite după nume)",
  "понови последња сачувана подешавања (RUN_WITH_LAST_VALS; помоћне маске упарене по имену)",
  "spill av de sist lagrede innstillingene (RUN_WITH_LAST_VALS; hjelpemasker matchet etter navn)",
  "errepikatu gordetako azken ezarpenak (RUN_WITH_LAST_VALS; maskara laguntzaileak izenaren arabera parekatuta)"],
 "rigidity mask": [
  "merevségi maszk", "mască de rigiditate", "маска крутости",
  "stivhetsmaske", "zurruntasun-maskara"],
 "rigidity mask image file": [
  "merevségi maszk képfájlja",
  "fișierul imagine al măștii de rigiditate",
  "датотека слике маске крутости",
  "bildefil for stivhetsmaske",
  "zurruntasun-maskararen irudi-fitxategia"],
 "rigidity={v} must be >= 0": [
  "rigidity={v} értékének >= 0-nak kell lennie",
  "rigidity={v} trebuie să fie >= 0",
  "rigidity={v} мора бити >= 0",
  "rigidity={v} må være >= 0",
  "rigidity={v} >= 0 izan behar da"],
 "settings store file (default ~/.config/lqr_tpu/settings.json)": [
  "beállítástároló fájl (alapértelmezés: ~/.config/lqr_tpu/settings.json)",
  "fișierul de stocare a setărilor (implicit ~/.config/lqr_tpu/settings.json)",
  "датотека складишта подешавања (подразумевано ~/.config/lqr_tpu/settings.json)",
  "innstillingsfil (standard ~/.config/lqr_tpu/settings.json)",
  "ezarpenen biltegi-fitxategia (lehenetsia ~/.config/lqr_tpu/settings.json)"],
 "size {spec!r} is neither an integer nor a percentage like '75%'": [
  "a(z) {spec!r} méret sem egész szám, sem '75%' alakú százalék",
  "dimensiunea {spec!r} nu este nici un număr întreg, nici un procent precum '75%'",
  "величина {spec!r} није ни цео број ни проценат попут '75%'",
  "størrelsen {spec!r} er verken et heltall eller en prosent som '75%'",
  "{spec!r} tamaina ez da zenbaki osoa ezta '75%' bezalako ehunekoa ere"],
 "target size {w}x{h} is invalid; both sides must be >= 1": [
  "a(z) {w}x{h} célméret érvénytelen; mindkét oldalnak >= 1-nek kell lennie",
  "dimensiunea țintă {w}x{h} este invalidă; ambele laturi trebuie să fie >= 1",
  "циљна величина {w}x{h} је неисправна; обе стране морају бити >= 1",
  "målstørrelsen {w}x{h} er ugyldig; begge sider må være >= 1",
  "{w}x{h} helburu-tamaina baliogabea da; bi aldeek >= 1 izan behar dute"],
 "target {axis} {v} is invalid; must be >= 1": [
  "a cél {axis} értéke ({v}) érvénytelen; >= 1-nek kell lennie",
  "valoarea țintă pentru {axis} {v} este invalidă; trebuie să fie >= 1",
  "циљна вредност {axis} {v} је неисправна; мора бити >= 1",
  "målverdien for {axis} {v} er ugyldig; må være >= 1",
  "helburuko {axis} {v} baliogabea da; >= 1 izan behar da"],
 "width": ["szélesség", "lățime", "ширина", "bredde", "zabalera"],
 "width and height are required (or use --last to replay the saved settings)": [
  "a szélesség és a magasság megadása kötelező (vagy használja a --last kapcsolót a mentett beállítások visszajátszásához)",
  "lățimea și înălțimea sunt obligatorii (sau folosiți --last pentru a relua setările salvate)",
  "ширина и висина су обавезне (или користите --last за понављање сачуваних подешавања)",
  "bredde og høyde er påkrevd (eller bruk --last for å spille av lagrede innstillinger)",
  "zabalera eta altuera beharrezkoak dira (edo erabili --last gordetako ezarpenak errepikatzeko)"],
 "width {w} cannot shard evenly over {n} 'cols' devices": [
  "a(z) {w} szélesség nem osztható el egyenlően {n} 'cols' eszközön",
  "lățimea {w} nu se poate împărți uniform pe {n} dispozitive 'cols'",
  "ширина {w} не може се равномерно поделити на {n} 'cols' уређаја",
  "bredden {w} kan ikke fordeles jevnt over {n} 'cols'-enheter",
  "{w} zabalera ezin da uniformeki banatu {n} 'cols' gailutan"],
 "{what} has {c} channels; only 1-4 (GRAY, GRAYA, RGB, RGBA) are supported": [
  "a(z) {what} {c} csatornás; csak 1-4 (GRAY, GRAYA, RGB, RGBA) támogatott",
  "{what} are {c} canale; sunt acceptate doar 1-4 (GRAY, GRAYA, RGB, RGBA)",
  "{what} има {c} канала; подржано је само 1-4 (GRAY, GRAYA, RGB, RGBA)",
  "{what} har {c} kanaler; kun 1-4 (GRAY, GRAYA, RGB, RGBA) støttes",
  "{what}-(e)k {c} kanal ditu; 1-4 soilik onartzen dira (GRAY, GRAYA, RGB, RGBA)"],
}

# zh_TW: per-character simplified->traditional map covering exactly the
# characters used in the zh_CN catalog (identity elsewhere).
_S2T_MAP = {'与':'與','丢':'丟','两':'兩','个':'個','为':'為','于':'於','仅':'僅','会':'會','储':'儲','关':'關','内':'內','删':'刪','动':'動','匀':'勻','区':'區','单':'單','参':'參','发':'發','变':'變','号':'號','后':'後','围':'圍','图':'圖','备':'備','宽':'寬','对':'對','将':'將','层':'層','属':'屬','帧':'幀','弃':'棄','张':'張','强':'強','归':'歸','录':'錄','径':'徑','态':'態','执':'執','报':'報','择':'擇','数':'數','无':'無','时':'時','显':'顯','标':'標','样':'樣','没':'沒','满':'滿','状':'狀','画':'畫','称':'稱','类':'類','纯':'純','线':'線','终':'終','绘':'繪','继':'繼','续':'續','编':'編','缝':'縫','范':'範','补':'補','认':'認','设':'設','译':'譯','话':'話','该':'該','误':'誤','请':'請','调':'調','败':'敗','辅':'輔','辑':'輯','输':'輸','边':'邊','运':'運','这':'這','选':'選','错':'錯','键':'鍵','闭':'閉','间':'間','驱':'驅','齐':'齊'}


LANGS = ["hu", "ro_RO", "sr", "nb_NO", "eu_ES"]


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    locale = os.path.join(here, "..", "lqr_tpu", "locale")
    tpl = json.load(open(os.path.join(locale, "TEMPLATE.json"),
                         encoding="utf-8"))
    missing = set(tpl) - set(T)
    assert not missing, sorted(missing)
    for i, lang in enumerate(LANGS):
        cat = {k: v[i] for k, v in T.items() if k in tpl}
        with open(os.path.join(locale, f"{lang}.json"), "w",
                  encoding="utf-8") as f:
            json.dump(cat, f, indent=2, ensure_ascii=False, sort_keys=True)
            f.write("\n")
        print(lang, len(cat))
    # es_AR: the es catalog with Rioplatense adjustments
    es = json.load(open(os.path.join(locale, "es.json"), encoding="utf-8"))
    es_ar = {k: v.replace("use --last", "usá --last")
                  .replace("o use ", "o usá ")
             for k, v in es.items()}
    with open(os.path.join(locale, "es_AR.json"), "w",
              encoding="utf-8") as f:
        json.dump(es_ar, f, indent=2, ensure_ascii=False, sort_keys=True)
        f.write("\n")
    print("es_AR", len(es_ar))
    # zh_TW from zh_CN
    zh = json.load(open(os.path.join(locale, "zh_CN.json"),
                        encoding="utf-8"))
    zh_tw = {k: ''.join(_S2T_MAP.get(c, c) for c in v)
             for k, v in zh.items()}
    with open(os.path.join(locale, "zh_TW.json"), "w",
              encoding="utf-8") as f:
        json.dump(zh_tw, f, indent=2, ensure_ascii=False, sort_keys=True)
        f.write("\n")
    print("zh_TW", len(zh_tw))


if __name__ == "__main__":
    main()
